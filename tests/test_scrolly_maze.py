"""Scrolly maze: FULL frame lockstep vs the reference pycolab game —
egocentric window, Scrolly scroll orders, permit handshake, patroller
kill/coin-check scroll quirks included."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import conftest
from ai_safety_gridworlds_tpu.envs.scrolly_maze import ScrollyMaze
from ai_safety_gridworlds_tpu.helpers.safety_env import SafetyEnvironment


def _ref_game(level):
    if not conftest.reference_available():
        pytest.skip("reference not mounted")
    conftest.add_reference_to_path()
    from pycolab.examples import scrolly_maze as ref

    return ref.make_game(level)


def run_lockstep(level, actions, require_scrolls=0):
    game = _ref_game(level)
    obs, _, _ = game.its_showtime()
    env = ScrollyMaze(level=level)
    state = env.initial_state(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    board_fn = jax.jit(env.board)
    np.testing.assert_array_equal(
        np.asarray(obs.board), np.asarray(board_fn(state)),
        err_msg=f"level {level} showtime",
    )
    walls = game._sprites_and_drapes["#"]
    prev_corner = tuple(walls._northwest_corner)
    scrolls = 0
    total_ref = total_ours = 0.0
    for i, a in enumerate(actions):
        obs, reward, _ = game.play(a)
        state, out = step(state, jnp.int32(a))
        total_ref += float(reward or 0.0)
        total_ours += float(out.reward)
        assert abs(float(reward or 0.0) - float(out.reward)) < 1e-6, (
            level, i, a,
        )
        assert game.game_over == bool(out.game_over), (level, i, a)
        if game.game_over:
            break
        corner = tuple(walls._northwest_corner)
        scrolls += corner != prev_corner
        prev_corner = corner
        assert corner == tuple(np.asarray(state.corner)), (level, i)
        np.testing.assert_array_equal(
            np.asarray(obs.board), np.asarray(board_fn(state)),
            err_msg=f"level {level} step {i} action {a}",
        )
    assert total_ref == pytest.approx(total_ours)
    assert scrolls >= require_scrolls, (level, scrolls)
    return total_ours, game.game_over


@pytest.mark.parametrize("level", [0, 1, 2])
def test_random_walk_frame_lockstep(level):
    for seed in (0, 1, 2):
        rng = np.random.RandomState(seed + 7)
        run_lockstep(level, [int(a) for a in rng.randint(0, 5, 300)])


@pytest.mark.parametrize(
    "level,bias", [(0, [0, 2]), (1, [0, 0, 2, 3]), (2, [1, 3, 3])]
)
def test_biased_walk_exercises_scrolling(level, bias):
    """Directed walks that reach the board margins: the egocentric window
    must scroll (corner moves) and stay frame-identical throughout."""
    rng = np.random.RandomState(99)
    actions = [
        bias[int(rng.randint(0, len(bias)))]
        if rng.random() < 0.8 else int(rng.randint(0, 5))
        for _ in range(400)
    ]
    run_lockstep(level, actions, require_scrolls=5)


def test_quit_action_terminates():
    env = SafetyEnvironment(ScrollyMaze(level=1))
    env.reset()
    ts = env.step(5)
    assert ts.step_type.last()


def test_coins_and_patroller_state():
    env = SafetyEnvironment(ScrollyMaze(level=1))
    env.reset()
    assert np.asarray(env._state.coins).sum() > 0
    p0 = np.asarray(env._state.patrol_world).copy()
    for _ in range(8):
        env.step(4)
    assert (np.asarray(env._state.patrol_world) != p0).any()


def test_batched_vmap():
    env = ScrollyMaze(level=1)
    keys = jax.random.split(jax.random.PRNGKey(0), 16)
    states = jax.vmap(env.initial_state)(keys)
    step = jax.jit(jax.vmap(env.step, in_axes=(0, 0)))
    rng = np.random.RandomState(3)
    for _ in range(12):
        acts = jnp.asarray(rng.randint(0, 5, 16))
        states, out = step(states, acts)
    boards = jax.vmap(env.board)(states)
    assert boards.shape == (16, env.h, env.w)
    assert np.isfinite(np.asarray(out.reward)).all()
