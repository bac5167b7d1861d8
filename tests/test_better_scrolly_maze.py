"""Better Scrolly Maze: deterministic frame lockstep vs the reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import conftest
from ai_safety_gridworlds_tpu.envs.better_scrolly_maze import (
    BetterScrollyMaze,
)


def _ref_game(level):
    if not conftest.reference_available():
        pytest.skip("reference not mounted")
    conftest.add_reference_to_path()
    from pycolab.examples import better_scrolly_maze as ref

    return ref.make_game(level)


def run_lockstep(level, actions):
    game = _ref_game(level)
    obs, reward, discount = game.its_showtime()
    env = BetterScrollyMaze(level=level)
    state = env.initial_state(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    board_fn = jax.jit(env.board)
    np.testing.assert_array_equal(
        np.asarray(obs.board), np.asarray(board_fn(state)), "showtime"
    )
    total_ref = total_ours = 0.0
    for i, a in enumerate(actions):
        obs, reward, discount = game.play(a)
        state, out = step(state, jnp.int32(a))
        total_ref += float(reward or 0.0)
        total_ours += float(out.reward)
        assert game.game_over == bool(out.game_over), (i, a)
        np.testing.assert_array_equal(
            np.asarray(obs.board),
            np.asarray(board_fn(state)),
            err_msg=f"step {i} action {a}",
        )
        if game.game_over:
            break
    assert total_ref == pytest.approx(total_ours)


@pytest.mark.parametrize("level", [0, 1, 2])
def test_random_walk_lockstep(level):
    rng = np.random.RandomState(17 + level)
    run_lockstep(level, [int(a) for a in rng.randint(0, 5, 250)])


def test_coin_collection_rewards():
    """Level 1: the player starts under a coin field; walking up collects."""
    game = _ref_game(1)
    game.its_showtime()
    env = BetterScrollyMaze(level=1)
    state = env.initial_state(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    total = 0.0
    for a in [0, 0, 0, 2, 0, 3, 3, 0]:
        obs, reward, discount = game.play(a)
        state, out = step(state, jnp.int32(a))
        assert float(reward or 0.0) == float(out.reward)
        total += float(out.reward)
        if game.game_over:
            break
    assert total >= 100.0


def test_patroller_catches():
    """Stand in a patroller's path until it arrives: episode terminates."""
    run_lockstep(1, [4] * 400)


def test_croppers():
    env = BetterScrollyMaze(level=0)
    state = env.initial_state(jax.random.PRNGKey(0))
    board = env.board(state)
    player_view, patroller_view, teaser = env.make_croppers()
    corner = player_view.initial_corner(state.pos, (env.h, env.w))
    win, corner = player_view.crop(board, position=state.pos, corner=corner)
    assert win.shape == (10, 30)
    t = teaser.crop(board)
    assert np.asarray(t).shape == (12, 20)
    # Teaser shows the coin hoard.
    assert (np.asarray(t) == ord("@")).sum() > 3


def test_batched_vmap():
    env = BetterScrollyMaze(level=0)
    keys = jax.random.split(jax.random.PRNGKey(0), 16)
    states = jax.vmap(lambda k: env.initial_state(k))(keys)
    step = jax.jit(jax.vmap(env.step))
    rng = np.random.RandomState(0)
    for _ in range(10):
        states, outs = step(
            states, jnp.asarray(rng.randint(0, 4, 16), jnp.int32)
        )
    assert outs.reward.shape == (16,)
