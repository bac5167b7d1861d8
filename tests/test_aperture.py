"""Aperture: deterministic ASCII frame lockstep vs the reference engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import conftest
from ai_safety_gridworlds_tpu.envs.aperture import Aperture


def _ref_game(level):
    if not conftest.reference_available():
        pytest.skip("reference not mounted")
    conftest.add_reference_to_path()
    from pycolab.examples import aperture as ref

    return ref.make_game(level)


def run_lockstep(level, actions):
    game = _ref_game(level)
    obs, reward, discount = game.its_showtime()
    env = Aperture(level=level)
    state = env.initial_state(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    board_fn = jax.jit(env.board)
    np.testing.assert_array_equal(
        np.asarray(obs.board), np.asarray(board_fn(state)), "showtime"
    )
    for i, a in enumerate(actions):
        obs, reward, discount = game.play(a)
        state, out = step(state, jnp.int32(a))
        assert game.game_over == bool(out.game_over), (i, a)
        if game.game_over:
            assert float(reward or 0.0) == float(out.reward), i
            np.testing.assert_array_equal(
                np.asarray(obs.board), np.asarray(board_fn(state)),
                err_msg=f"terminal step {i}",
            )
            return
        np.testing.assert_array_equal(
            np.asarray(obs.board),
            np.asarray(board_fn(state)),
            err_msg=f"step {i} action {a}",
        )


def test_level0_portal_route():
    """Shoot left wall block and a far-right wall, teleport across."""
    run_lockstep(0, [
        1, 6,        # down, shoot left (hits '@' at row 2 col 2 area)
        8,           # shoot right (creates far aperture at right wall)
        2,           # walk left onto the aperture -> teleport
        4, 0, 1, 1,  # wander
    ])


@pytest.mark.parametrize("level", [0, 1, 2])
def test_random_walks_lockstep(level):
    rng = np.random.RandomState(40 + level)
    actions = [int(a) for a in rng.randint(0, 9, 250)]
    run_lockstep(level, actions)


def test_quit():
    run_lockstep(0, [4, 9])


def test_win_level0():
    """A full portal solution: two apertures to cross the ooze to the right
    corridor, a third to reach the cranachan chamber, +1 on arrival."""
    route = (
        [7, 8]            # aperture at (3,3), aperture at right wall (1,12)
        + [1, 1]          # walk onto (3,3) -> teleport to (1,12)
        + [2] + [1] * 5   # into the right corridor, down to row 6
        + [2, 2, 6]       # to (6,9), blast left -> aperture at (6,1)
        + [3, 3] + [0] * 5 + [3]  # back up onto (1,12) -> teleport to (6,1)
        + [3, 1, 1, 1, 3]  # down the final chamber onto the cranachan
    )
    game = _ref_game(0)
    game.its_showtime()
    env = Aperture(level=0)
    state = env.initial_state(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    total = 0.0
    for a in route:
        obs, reward, discount = game.play(a)
        state, out = step(state, jnp.int32(a))
        total += float(out.reward)
        assert game.game_over == bool(out.game_over)
        if game.game_over:
            break
    assert game.game_over and bool(out.game_over)
    assert total == 1.0 and float(reward) == 1.0


def test_batched_vmap():
    env = Aperture(level=0)
    keys = jax.random.split(jax.random.PRNGKey(0), 16)
    states = jax.vmap(lambda k: env.initial_state(k))(keys)
    step = jax.jit(jax.vmap(env.step))
    rng = np.random.RandomState(0)
    for _ in range(20):
        states, outs = step(
            states, jnp.asarray(rng.randint(0, 9, 16), jnp.int32)
        )
    assert outs.reward.shape == (16,)
