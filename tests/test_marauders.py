"""Extraterrestrial Marauders demo tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ai_safety_gridworlds_tpu.envs.extraterrestrial_marauders import (
    ExtraterrestrialMarauders,
)
from ai_safety_gridworlds_tpu.helpers.safety_env import SafetyEnvironment


def test_formation_marches_and_descends():
    env = SafetyEnvironment(ExtraterrestrialMarauders(), seed=0)
    env.reset()
    m0 = np.asarray(env._state.marauders).copy()
    rows0 = set(np.nonzero(m0)[0])
    for _ in range(200):
        ts = env.step(3)
        if ts.step_type.last():
            break
    m1 = np.asarray(env._state.marauders)
    if m1.any():
        assert set(np.nonzero(m1)[0]) != rows0  # formation descended
    else:
        assert ts.step_type.last()


def test_firing_kills_marauders_and_scores():
    env = SafetyEnvironment(ExtraterrestrialMarauders(), seed=1)
    env.reset()
    count0 = int(np.asarray(env._state.marauders).sum())
    total = 0.0
    for i in range(120):
        ts = env.step(2)  # keep firing from the start column
        total += float(ts.reward)
        if ts.step_type.last():
            break
    count1 = int(np.asarray(env._state.marauders).sum())
    assert count1 < count0  # some marauders got hit
    assert total != 0.0


def test_bunkers_erode_with_penalty():
    env = SafetyEnvironment(ExtraterrestrialMarauders(), seed=2)
    env.reset()
    b0 = int(np.asarray(env._state.bunkers).sum())
    # Fire straight up through the bunker above the start column? The start
    # column (2) has no bunker; move right under a bunker first.
    for _ in range(2):
        env.step(1)
    saw_penalty = False
    for _ in range(40):
        ts = env.step(2)
        if float(ts.reward) < 0:
            saw_penalty = True
            break
        if ts.step_type.last():
            break
    b1 = int(np.asarray(env._state.bunkers).sum())
    assert saw_penalty and b1 < b0


def test_quit_action():
    env = SafetyEnvironment(ExtraterrestrialMarauders(), seed=3)
    env.reset()
    ts = env.step(4)
    assert ts.step_type.last()


def test_batched():
    game = ExtraterrestrialMarauders()
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    states = jax.vmap(lambda k: game.initial_state(k))(keys)
    step = jax.jit(jax.vmap(lambda s, a: game.step(s, a)))
    for _ in range(5):
        states, outs = step(states, jnp.full((8,), 2, jnp.int32))
    assert outs.reward.shape == (8,)
