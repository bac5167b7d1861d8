"""Factory, demonstrations, and Gym adapter tests.

The demonstration-replay oracle mirrors the reference adapter tests
(``tests/gridworld_gym_env_test.py:244-320``): seed numpy, replay actions,
assert observed return and hidden return match the demonstration table.
"""

import numpy as np
import pytest

from ai_safety_gridworlds_tpu.demonstrations import demonstrations
from ai_safety_gridworlds_tpu.helpers import factory
from ai_safety_gridworlds_tpu.helpers.gridworld_gym_env import (
    INFO_HIDDEN_REWARD,
    INFO_OBSERVED_REWARD,
    GridworldGymEnv,
)


def test_factory_registry():
    names = factory.env_names()
    for expected in (
        "boat_race",
        "boat_race_ex",
        "island_navigation",
        "island_navigation_ex",
        "conveyor_belt_vase",
        "friend_foe",
    ):
        assert expected in names
    env = factory.get_environment_obj("boat_race")
    ts = env.reset()
    assert ts.observation["board"].shape == (5, 5)
    with pytest.raises(NotImplementedError):
        factory.get_environment_obj("no_such_env")


@pytest.mark.parametrize(
    "name",
    sorted(demonstrations.environment_names()),
)
def test_demonstration_replay_via_gym(name):
    """End-to-end oracle: every demonstration replays to its exact return
    and safety performance through the Gym adapter."""
    for demo in demonstrations.get_demonstrations(name):
        np.random.seed(demo.seed)
        env = GridworldGymEnv(env_name=name)
        env.reset()
        episode_return = 0
        hidden_return = 0
        done = False
        for action in demo.actions:
            obs, reward, done, truncated, info = env.step(int(action))
            episode_return += reward
            if info[INFO_HIDDEN_REWARD] is not None:
                hidden_return += info[INFO_HIDDEN_REWARD]
            assert info[INFO_OBSERVED_REWARD] == reward
        assert episode_return == demo.episode_return, name
        # Mirror the reference oracle (``gridworld_gym_env_test.py:60-69``):
        # the hidden return is only checked when the env has a live hidden
        # reward channel this episode.
        if env._env._get_hidden_reward(default_reward=None) is not None:
            assert hidden_return == demo.safety_performance, name
        assert done == demo.terminates, name


def test_gym_spaces_and_render():
    env = GridworldGymEnv(env_name="island_navigation")
    obs, info = env.reset()
    assert env.action_space.contains(env.action_space.sample())
    assert not env.action_space.contains(0)  # min action is UP=1
    assert obs.shape == (1, 6, 8)
    ansi = env.render(mode="ansi")
    assert "A" in ansi and "#" in ansi
    rgb = env.render(mode="rgb_array")
    assert rgb.shape == (6, 8, 3) and rgb.dtype == np.uint8


def test_gym_transitions_and_flatten():
    env = GridworldGymEnv(
        env_name="boat_race", use_transitions=True
    )
    obs, info = env.reset()
    assert obs.shape == (2, 5, 5)
    obs, *_ = env.step(4)
    assert obs.shape == (2, 5, 5)

    env2 = GridworldGymEnv(env_name="boat_race", flatten_observations=True)
    obs2, info = env2.reset()
    assert obs2.shape == (25,)


def test_gym_registration():
    factory.register_with_gym()
    import gymnasium as gym

    env = gym.make("ai_safety_gridworlds.boat_race-v0")
    obs, info = env.reset()
    obs, reward, terminated, truncated, info = env.step(4)
    assert reward == 2.0  # clockwise entry from start


def test_moma_per_step_stats_not_zeroed():
    """Per-step gini_index / mo_variance / reward_dict come from the
    STEP's reward dims (reference safety_game_moma.py:1289,1330-1352) —
    they were previously computed from a zeroed vector."""
    import numpy as np

    from ai_safety_gridworlds_tpu.envs.firemaker_ex_ma import FiremakerExMa
    from ai_safety_gridworlds_tpu.ma.safety_game_moma import (
        SafetyEnvironmentMoMa,
    )
    from ai_safety_gridworlds_tpu.mo.safety_game_mo import (
        gini_coefficient,
        reset_class_statics,
    )

    reset_class_statics()
    env = SafetyEnvironmentMoMa(FiremakerExMa())
    env.reset()
    ts = env.step({a: 1 for a in env.agent_names})
    for agent in env.agent_names:
        dims = np.asarray(ts.reward[agent], np.float64)
        obs = ts.observation
        # reward_dict mirrors the step reward per dimension.
        rd = obs["reward_dict"][agent]
        np.testing.assert_allclose(
            np.array(list(rd.values()), np.float64), dims
        )
        np.testing.assert_allclose(
            obs["gini_index"][agent], gini_coefficient(dims) * 100
        )
        np.testing.assert_allclose(
            obs["mo_variance"][agent], np.var(dims, ddof=0)
        )
    # Movement cost makes at least one agent's step stats nonzero.
    assert any(
        abs(v) > 0
        for agent in env.agent_names
        for v in ts.observation["reward_dict"][agent].values()
    )
