"""Adapter conformance sweep over EVERY registered environment.

Mirrors the reference adapter test matrix
(``tests/gridworld_zoo_parallel_env_test_ma.py:96-122``,
``tests/gridworld_gym_env_test.py:244-320``) for all factory names:

* action-space sample ⊆ contains,
* observation returned by reset/step lies in the observation space,
* state-copy semantics: previously returned observations must not alias
  live engine state (advancing the env must not mutate them),
* transitions mode stacks (t-1, t),
* renders (ansi + rgb) stay consistent while stepping.

MA environments are driven single-agent through the Gym adapter (other
agents become NPCs, ``gridworld_gym_env.py:475-480``) and through the Zoo
Parallel adapter with full action dicts.
"""

import numpy as np
import pytest

from ai_safety_gridworlds_tpu.helpers import factory
from ai_safety_gridworlds_tpu.helpers.gridworld_gym_env import GridworldGymEnv
from ai_safety_gridworlds_tpu.helpers.gridworld_zoo_parallel_env import (
    GridworldZooParallelEnv,
)
from ai_safety_gridworlds_tpu.ma.safety_game_moma import SafetyEnvironmentMoMa
from ai_safety_gridworlds_tpu.mo.safety_game_mo import reset_class_statics

ALL_ENVS = sorted(factory.env_names())
MA_ENVS = {"island_navigation_ex_ma", "firemaker_ex_ma", "aintelope_savanna"}
TRANSITIONS_SAMPLE = {
    "boat_race", "island_navigation_ex", "firemaker_ex_ma", "friend_foe",
}


@pytest.mark.parametrize("name", ALL_ENVS)
def test_gym_adapter_conformance(name):
    reset_class_statics()
    np.random.seed(0)
    env = GridworldGymEnv(env_name=name)
    obs, info = env.reset()
    act_space = env.action_space
    obs_space = env.observation_space

    for _ in range(4):
        sample = act_space.sample()
        assert act_space.contains(sample), (name, sample)
    assert obs_space.contains(np.asarray(obs, np.float32)), name

    # Step with boundary actions and samples; keep snapshots for aliasing.
    snapshots = []
    for action in (
        act_space.min_action,
        act_space.max_action,
        int(np.asarray(act_space.sample()).item()),
    ):
        obs, reward, done, truncated, info = env.step(int(action))
        assert obs_space.contains(np.asarray(obs, np.float32)), name
        snapshots.append((np.asarray(obs), np.asarray(obs).copy()))
        ansi = env.render(mode="ansi")
        assert isinstance(ansi, str) and len(ansi) > 0
        rgb = env.render(mode="rgb_array")
        assert rgb.dtype == np.uint8 and rgb.ndim == 3
        if done:
            env.reset()
    # State-copy semantics: stepping further must not mutate previously
    # returned observations (no aliasing of engine state).
    env.step(int(act_space.min_action))
    for live, copy_ in snapshots:
        np.testing.assert_array_equal(live, copy_, err_msg=name)


@pytest.mark.parametrize("name", sorted(TRANSITIONS_SAMPLE))
def test_gym_transitions_mode(name):
    reset_class_statics()
    np.random.seed(0)
    env = GridworldGymEnv(env_name=name, use_transitions=True)
    obs, info = env.reset()
    assert obs.shape[0] == 2
    prev_frame = np.asarray(obs[1]).copy()
    obs, *_ = env.step(int(env.action_space.min_action))
    # The first slot of the stacked observation is the previous frame.
    np.testing.assert_array_equal(np.asarray(obs[0]), prev_frame, name)


@pytest.mark.parametrize("name", sorted(MA_ENVS))
def test_zoo_parallel_conformance(name):
    reset_class_statics()
    env = GridworldZooParallelEnv(env_name=name)
    observations, infos = env.reset(seed=2)
    assert isinstance(env._env, SafetyEnvironmentMoMa)
    rng = np.random.RandomState(1)
    for agent in env.possible_agents:
        space = env.action_space(agent)
        for _ in range(4):
            assert space.contains(space.sample())
        assert env.observation_space(agent).contains(
            np.asarray(observations[agent], np.float32)
        ), (name, agent)
    snapshots = []
    for _ in range(5):
        if not env.agents:
            break
        actions = {
            a: int(rng.randint(0, 5)) for a in env.agents
        }
        observations, rewards, terms, truncs, infos = env.step(actions)
        for a, o in observations.items():
            assert env.observation_space(a).contains(
                np.asarray(o, np.float32)
            ), (name, a)
            snapshots.append((np.asarray(o), np.asarray(o).copy()))
        assert set(rewards) == set(observations)
        for a in observations:
            assert "hidden_reward" in infos[a] and "discount" in infos[a]
    for live, copy_ in snapshots:
        np.testing.assert_array_equal(live, copy_, err_msg=name)


@pytest.mark.parametrize("name", sorted(MA_ENVS))
def test_gym_drives_ma_env_single_agent(name):
    """MA envs through the Gym adapter: the chosen agent acts, others are
    NPCs (``gridworld_gym_env.py:475-480``)."""
    reset_class_statics()
    np.random.seed(0)
    probe = factory.get_environment_obj(name)
    first_char = probe.agent_names[0]
    reset_class_statics()
    env = GridworldGymEnv(env_name=name, agent_character=first_char)
    obs, info = env.reset()
    for _ in range(3):
        obs, reward, done, truncated, info = env.step(
            int(env.action_space.sample())
        )
        assert np.asarray(obs).ndim >= 2
        if done:
            env.reset()


# Envs whose repeated same-seed resets legitimately differ: the reference's
# deterministic-seeding scheme advances class-static trial/episode counters
# across resets (layout seed = crc32(seed, env_layout_seed); savanna-family
# envs additionally re-randomize maps every episode), so gymnasium's
# same-seed determinism assertion cannot hold without breaking reference
# parity (PARITY.md "Documented deviations").
TRIAL_COUNTER_NONDETERMINISTIC = {
    "aintelope_savanna", "danger_tiles", "food_drink_homeostasis",
    "food_drink_homeostasis_danger_gold_silver",
    "food_drink_homeostasis_gold", "food_drink_homeostasis_gold_silver",
    "food_drink_homeostasis_predators_gold_silver", "food_homeostasis",
    "food_sharing", "food_sustainability", "food_unbounded", "predators",
    "safe_interruptibility_ex", "savanna_demo",
}


def test_official_gymnasium_check_env_sweep():
    """The OFFICIAL gymnasium env checker over every registered env: all
    pass outright except the known trial-counter envs, which must fail
    ONLY the same-seed determinism assertion (reference-faithful
    counters) and nothing else."""
    import warnings

    from gymnasium.utils.env_checker import check_env

    failures = {}
    for name in ALL_ENVS:
        reset_class_statics()
        np.random.seed(0)
        env = GridworldGymEnv(env_name=name)
        with warnings.catch_warnings():
            warnings.filterwarnings("ignore")
            try:
                check_env(env, skip_render_check=True)
            except AssertionError as e:
                failures[name] = str(e)
    unexpected = {
        n: m for n, m in failures.items()
        if n not in TRIAL_COUNTER_NONDETERMINISTIC
        or "Deterministic step" not in m
    }
    assert not unexpected, unexpected
    missing = TRIAL_COUNTER_NONDETERMINISTIC - set(failures)
    # A formerly nondeterministic env passing outright is fine only if
    # its dynamics changed intentionally — flag it for review.
    assert not missing, missing
