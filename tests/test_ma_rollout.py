"""Batched multi-agent rollout machinery tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ai_safety_gridworlds_tpu.envs.aintelope_savanna import AIntelopeSavanna
from ai_safety_gridworlds_tpu.envs.firemaker_ex_ma import FiremakerExMa
from ai_safety_gridworlds_tpu.ma.safety_game_ma import (
    ma_episode_reset,
    ma_episode_step,
    ma_rollout,
)


def test_ma_rollout_auto_resets():
    game = AIntelopeSavanna(amount_agents=2, level=13, max_iterations=20)
    eps, stats = jax.jit(
        lambda k: ma_rollout(game, k, n_steps=64, batch_size=32)
    )(jax.random.PRNGKey(0))
    # 20-step episodes over 64 steps x 32 envs: ~3 episodes per env finish.
    assert int(stats["episodes"]) >= 2 * 32
    assert stats["sum_final_returns"].shape == (2, game.reward_space.n_dims)


def test_ma_episode_step_reset_emits_first():
    game = FiremakerExMa(max_iterations=3)
    ep = ma_episode_reset(game, jax.random.PRNGKey(1))
    step = jax.jit(lambda e, a: ma_episode_step(game, e, a))
    acts = jnp.ones((game.n_agents,), jnp.int32)
    # The frame counter advances per SUB-STEP (one per acting agent), so a
    # 3-frame limit with 2 agents truncates on the second env step.
    saw_over = False
    for _ in range(4):
        ep, outs = step(ep, acts)
        if bool(outs.step.game_over):
            saw_over = True
            break
    assert saw_over
    ep, outs = step(ep, acts)  # auto-reset
    assert np.all(np.asarray(outs.step.step_types) == 0)  # FIRST
    assert float(jnp.sum(outs.step.rewards)) == 0.0
