"""Tennis: frame lockstep vs the reference engine with a synchronized
``random``-module stream."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import conftest
from ai_safety_gridworlds_tpu.envs.tennis import Tennis


def _ref_game():
    if not conftest.reference_available():
        pytest.skip("reference not mounted")
    conftest.add_reference_to_path()
    import importlib

    ref = importlib.import_module(
        "pycolab.examples.tennnnnnnnnnnnnnnnnnnnnnnnis"
    )
    return ref.make_game()


def run_lockstep(seed, n_steps, policy):
    random.seed(seed)
    game = _ref_game()
    obs, reward, discount = game.its_showtime()

    random.seed(seed)
    env = Tennis()
    state = env.initial_state(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    board_fn = jax.jit(env.board)
    np.testing.assert_array_equal(
        np.asarray(obs.board), np.asarray(board_fn(state)), "showtime"
    )
    rng = np.random.RandomState(seed)
    totals = np.zeros(2)
    for i in range(n_steps):
        a1, a2 = policy(rng, i)
        pre = random.getstate()
        obs, reward, discount = game.play({"1": a1, "2": a2})
        post = random.getstate()
        random.setstate(pre)
        opts = {
            k: jnp.asarray(v)
            for k, v in env.host_step_options(
                state, np.asarray([a1, a2])
            ).items()
        }
        assert random.getstate() == post, i  # same draw consumption
        state, out = step(state, jnp.asarray([a1, a2], jnp.int32), opts)
        totals += np.asarray(out.reward)
        if reward is not None:
            np.testing.assert_array_equal(
                np.asarray(reward), np.asarray(out.reward), err_msg=str(i)
            )
        assert game.game_over == bool(out.game_over), i
        np.testing.assert_array_equal(
            np.asarray(obs.board),
            np.asarray(board_fn(state)),
            err_msg=f"step {i}",
        )
        if game.game_over:
            break
    return totals, game.game_over


def test_lockstep_passive_paddles():
    totals, over = run_lockstep(1, 3000, lambda rng, i: (0, 0))
    # With no paddle movement the ball bounces between walls: someone
    # reaches four points and the match ends.
    assert over and totals.max() == 4


def test_lockstep_random_paddles():
    policy = lambda rng, i: (int(rng.randint(0, 3)), int(rng.randint(0, 3)))
    totals, over = run_lockstep(7, 3000, policy)
    assert over


def test_quit_action():
    env = Tennis()
    state = env.initial_state(jax.random.PRNGKey(0))
    state, out = jax.jit(env.step)(state, jnp.asarray([3, 0], jnp.int32))
    assert bool(out.game_over)


def test_croppers_views():
    env = Tennis()
    state = env.initial_state(jax.random.PRNGKey(0))
    board = env.board(state)
    p1, ball, p2 = env.make_croppers()
    w1 = p1.crop(board)
    assert np.asarray(w1).shape == (10, 10)
    corner = ball.initial_corner(state.ball, (env.h, env.w))
    win, corner = ball.crop(board, position=state.ball, corner=corner)
    assert np.asarray(win).shape == (10, 31)


def test_batched_vmap():
    env = Tennis()
    keys = jax.random.split(jax.random.PRNGKey(0), 32)
    states = jax.vmap(lambda k: env.initial_state(k))(keys)
    step = jax.jit(jax.vmap(env.step))
    for _ in range(40):
        states, outs = step(states, jnp.zeros((32, 2), jnp.int32))
    assert outs.reward.shape == (32, 2)
