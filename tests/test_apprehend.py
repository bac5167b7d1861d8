"""Apprehend (catch demo) tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ai_safety_gridworlds_tpu.envs.apprehend import Apprehend
from ai_safety_gridworlds_tpu.helpers.safety_env import SafetyEnvironment


def play_episode(seed, policy):
    env = SafetyEnvironment(Apprehend(), seed=seed)
    ts = env.reset()
    total = 0.0
    while not ts.step_type.last():
        col = int(np.asarray(env._state.player_col))
        ball_col = int(np.asarray(env._state.ball)[1])
        ts = env.step(policy(col, ball_col))
        total += float(ts.reward)
    return total


def test_tracking_policy_catches():
    # Following the ball's column catches it for any trajectory.
    chase = lambda col, ball: 0 if ball < col else (1 if ball > col else 2)
    for seed in range(5):
        assert play_episode(seed, chase) == 1.0, seed


def test_static_policy_usually_misses():
    # Staying put only catches balls that land dead-centre.
    stay = lambda col, ball: 2
    results = [play_episode(seed, stay) for seed in range(8)]
    assert any(r == -1.0 for r in results)


def test_episode_length_is_board_height():
    env = SafetyEnvironment(Apprehend(), seed=0)
    ts = env.reset()
    steps = 0
    while not ts.step_type.last():
        ts = env.step(2)
        steps += 1
    # Showtime already dropped the ball to row 1 (reference its_showtime
    # sweep): a catch lands on the bottom row at step 8, a miss leaves
    # the 10-row board at step 9.
    assert steps == (8 if float(ts.reward) == 1.0 else 9)


def test_repainted_rgb_identical_for_both_sprites():
    env = SafetyEnvironment(Apprehend(), seed=0)
    env.reset()
    obs = env.last_observation()
    rgb = np.asarray(obs["RGB"])
    ball = tuple(np.asarray(env._state.ball))
    player = (9, int(np.asarray(env._state.player_col)))
    assert np.array_equal(rgb[:, ball[0], ball[1]], rgb[:, player[0], player[1]])


def test_batched():
    game = Apprehend()
    keys = jax.random.split(jax.random.PRNGKey(0), 64)
    states = jax.vmap(lambda k: game.initial_state(k))(keys)
    # Per-env velocities differ (per-episode device randomness).
    assert len(set(np.asarray(states.dx).round(6).tolist())) > 10
    step = jax.jit(jax.vmap(lambda s, a: game.step(s, a)))
    states, outs = step(states, jnp.full((64,), 2, jnp.int32))
    assert outs.reward.shape == (64,)


def test_frame_lockstep_vs_pycolab():
    """Frame lockstep against the reference pycolab game (dx injected
    from the reference sprite so both sides share the velocity)."""
    import random

    import pytest

    import conftest

    if not conftest.reference_available():
        pytest.skip("reference not mounted")
    conftest.add_reference_to_path()
    from pycolab.examples import apprehend as ref_apprehend

    for seed in (0, 3, 11):
        random.seed(seed)
        game = ref_apprehend.make_game()
        obs, reward, _ = game.its_showtime()
        dx = game.things["b"]._dx

        env = Apprehend()
        state = env.initial_state(
            jax.random.PRNGKey(0), options={"dx": dx}
        )
        board_fn = jax.jit(env.board)
        step = jax.jit(env.step)
        np.testing.assert_array_equal(
            np.asarray(obs.board), np.asarray(board_fn(state)),
            err_msg=f"seed {seed} showtime",
        )
        for i in range(12):
            a = [0, 1, 2][i % 3]
            obs, reward, _ = game.play(a)
            state, out = step(state, jnp.int32(a))
            assert game.game_over == bool(out.game_over), (seed, i)
            np.testing.assert_allclose(
                float(reward or 0.0), float(out.reward), err_msg=(seed, i)
            )
            np.testing.assert_array_equal(
                np.asarray(obs.board), np.asarray(board_fn(state)),
                err_msg=f"seed {seed} step {i}",
            )
            if game.game_over:
                break
