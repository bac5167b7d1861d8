"""PettingZoo Parallel and AEC adapter tests."""

import numpy as np
import pytest

from ai_safety_gridworlds_tpu.helpers.gridworld_zoo_aec_env import (
    GridworldZooAecEnv,
)
from ai_safety_gridworlds_tpu.helpers.gridworld_zoo_parallel_env import (
    GridworldZooParallelEnv,
)
from ai_safety_gridworlds_tpu.mo.safety_game_mo import reset_class_statics


def test_parallel_multi_agent_episode():
    reset_class_statics()
    env = GridworldZooParallelEnv(env_name="island_navigation_ex_ma", level=9)
    assert env.possible_agents == ["agent_1", "agent_2"]
    observations, infos = env.reset(seed=3)
    assert set(observations) == {"agent_1", "agent_2"}
    # Agent perspective with radius [2,2,2,2] -> 5x5 board, stacked depth 1.
    assert observations["agent_1"].shape == (1, 5, 5)
    rng = np.random.RandomState(0)
    for _ in range(30):
        if not env.agents:
            break
        actions = {a: int(rng.randint(0, 5)) for a in env.agents}
        observations, rewards, terminations, truncations, infos = env.step(
            actions
        )
        for a in actions:
            assert env.action_space(a).contains(actions[a])
            assert isinstance(rewards[a], np.ndarray) or np.isscalar(
                rewards[a]
            )
        # Observations must not alias each other or the engine state
        # (state-copy semantics, reference adapter tests 146-181).
        o1 = observations.get("agent_1")
        if o1 is not None:
            o1_copy = o1.copy()
            env.render("ansi")
            np.testing.assert_array_equal(o1, o1_copy)


def test_parallel_test_death():
    reset_class_statics()
    env = GridworldZooParallelEnv(
        env_name="island_navigation_ex_ma",
        level=9,
        test_death=True,
        test_death_probability=0.5,
    )
    env.reset(seed=5)
    rng = np.random.RandomState(1)
    died = False
    for _ in range(50):
        if not env.agents:
            break
        actions = {a: int(rng.randint(0, 5)) for a in env.agents}
        _, _, terminations, _, _ = env.step(actions)
        died = died or any(terminations.values())
    assert died


def test_parallel_single_agent_env():
    reset_class_statics()
    env = GridworldZooParallelEnv(env_name="boat_race")
    observations, infos = env.reset()
    assert env.possible_agents == ["agent_0"]
    obs, rewards, terms, truncs, infos = env.step({"agent_0": 4})
    assert rewards["agent_0"] == 2.0


def test_aec_cycle():
    reset_class_statics()
    env = GridworldZooAecEnv(env_name="island_navigation_ex_ma", level=9)
    env.reset(seed=7)
    assert env.agent_selection == "agent_1"
    rng = np.random.RandomState(2)
    for _ in range(40):
        if not env.agents or env.agent_selection is None:
            break
        obs, reward, terminated, truncated, info = env.last()
        if terminated or truncated:
            env.step(None)
            continue
        env.step(int(rng.randint(0, 5)))
    # Cycled through both agents repeatedly without protocol errors.
    assert True


def test_parallel_info_coordinates_and_cube():
    from ai_safety_gridworlds_tpu.mo.safety_game_mo import reset_class_statics

    reset_class_statics()
    env = GridworldZooParallelEnv(
        env_name="firemaker_ex_ma",
        object_coordinates_in_observation=True,
        layers_order_in_cube=[],
    )
    env.reset(seed=0)
    obs, rewards, terms, truncs, infos = env.step(
        {a: 1 for a in env.agents}
    )
    info = infos[env.agents[0]]
    coords = info["info_observation_coordinates"]
    assert len(coords["1"]) == 1  # one worker cell
    cube = info["info_observation_layers_cube"]
    order = info["info_observation_layers_order"]
    assert cube.shape[0] == len(order)
