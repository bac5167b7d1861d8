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
    frames_before = int(np.asarray(env._env._state.t))
    steps_taken = 0
    for _ in range(40):
        if not env.agents or env.agent_selection is None:
            break
        obs, reward, terminated, truncated, info = env.last()
        assert obs is not None
        if terminated or truncated:
            env.step(None)
            continue
        env.step(int(rng.randint(0, 5)))
        steps_taken += 1
        # Per-turn stepping: EVERY adapter step advances the shell by
        # exactly one engine frame (one sub-step).
        assert (
            int(np.asarray(env._env._state.t))
            == frames_before + steps_taken
        )
        assert "observed_reward" in env.observe_info(env.possible_agents[0])
    assert steps_taken > 2


def test_aec_interleaved_observation():
    """Agent 2 (the whole-map supervisor) observes agent 1's move within the
    same cycle — the reference steps the env the moment each agent acts
    (``gridworld_zoo_aec_env.py:650-657``)."""
    reset_class_statics()
    env = GridworldZooAecEnv(
        env_name="firemaker_ex_ma",
        randomize_agent_actions_order=False,
    )
    env.reset(seed=11)
    game = env._env._game
    worker_value = None
    # The value LUT maps worker '1' to a unique float code.
    lut = np.asarray(game._value_lut)
    worker_value = float(lut[ord("1")])

    def worker_cells(board):
        return set(map(tuple, np.argwhere(board == worker_value)))

    sup_before = worker_cells(np.asarray(env.observe("agent_S")))
    assert env.agent_selection == "agent_1"
    pos_before = np.asarray(env._env._state.pos[0]).copy()
    env.step(2)  # RIGHT (ActionsMo.RIGHT == 2)
    pos_after = np.asarray(env._env._state.pos[0])
    assert not np.array_equal(pos_before, pos_after)
    # Before agent 2 or S act this cycle, the supervisor's observation
    # already shows the worker's new position.
    assert env.agent_selection == "agent_S"
    sup_after = worker_cells(np.asarray(env.observe("agent_S")))
    assert sup_before != sup_after


def test_aec_dead_step_protocol():
    """A terminated agent must step(None) exactly once and is then removed;
    a non-None action raises (``gridworld_zoo_aec_env.py:621-643``)."""
    reset_class_statics()
    env = GridworldZooAecEnv(
        env_name="firemaker_ex_ma", max_iterations=3
    )
    env.reset(seed=1)
    # 3 agents x 1 sub-step each = frame 3 = max_iterations: the 3rd
    # agent's own step flags it terminated.
    env.step(0)
    env.step(0)
    env.step(0)
    assert env.terminations[env.agent_selection] in (False, True)
    # Find a terminated agent via last() and exercise the protocol.
    for _ in range(8):
        if env.agent_selection is None:
            break
        obs, reward, terminated, truncated, info = env.last()
        if terminated or truncated:
            agent = env.agent_selection
            with pytest.raises(ValueError):
                env.step(0)
            env.step(None)
            assert agent not in env.agents
            assert agent not in env.terminations
            break
        env.step(0)
    else:
        pytest.fail("no agent ever terminated under max_iterations=3")


def test_aec_pre_step_callback_and_cumulative_rewards():
    reset_class_statics()
    seen = []

    def callback(agent, action):
        seen.append((agent, action))
        return 0  # rewrite everything to NOOP

    env = GridworldZooAecEnv(
        env_name="firemaker_ex_ma",
        pre_step_callback=callback,
        randomize_agent_actions_order=False,
    )
    env.reset(seed=2)
    pos0 = np.asarray(env._env._state.pos).copy()
    env.step(2)
    env.step(2)
    assert seen == [("agent_1", 2), ("agent_S", 2)]
    # The callback rewrote both moves to NOOP: nobody moved.
    np.testing.assert_array_equal(pos0, np.asarray(env._env._state.pos))
    # Cumulative rewards are cleared at the agent's own turn and accrue
    # across other agents' turns.
    assert isinstance(env._cumulative_rewards["agent_1"], (float, np.ndarray))


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
