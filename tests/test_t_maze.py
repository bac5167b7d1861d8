"""T-maze: frame lockstep vs the reference pycolab Scrolly machinery."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import conftest
from ai_safety_gridworlds_tpu.envs.t_maze import TMaze


def _ref_game(**kw):
    if not conftest.reference_available():
        pytest.skip("reference not mounted")
    conftest.add_reference_to_path()
    import importlib, sys, os

    sys.path.insert(
        0, os.path.join(conftest.REFERENCE_ROOT, "pycolab/examples/research/lp-rnn")
    )
    t_maze = importlib.import_module("t_maze")
    return t_maze.make_game(**kw)


def run_lockstep(seed, actions, n_check=None, **kw):
    random.seed(seed)
    np.random.seed(seed)
    game = _ref_game(
        level=kw.get("level", 0),
        cue_after_teleport=kw.get("cue_after_teleport", False),
        timeout_frames=kw.get("timeout_frames", 300),
        teleport_delay=kw.get("teleport_delay", 5),
        limbo_time=kw.get("limbo_time", 6),
    )
    obs, reward, discount = game.its_showtime()

    random.seed(seed)
    np.random.seed(seed)
    env = TMaze(**{k: kw.get(k, d) for k, d in (
        ("level", 0), ("cue_after_teleport", False),
        ("timeout_frames", 300), ("teleport_delay", 5),
        ("limbo_time", 6),
    )})
    options = {
        k: jnp.asarray(v) for k, v in env.host_reset_options().items()
    }
    state = env.initial_state(jax.random.PRNGKey(0), options)
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
        assert game.game_over == bool(out.game_over), i
        if game.game_over:
            break
        np.testing.assert_array_equal(
            np.asarray(obs.board),
            np.asarray(board_fn(state)),
            err_msg=f"step {i} action {a}",
        )
    assert total_ref == pytest.approx(total_ours, abs=1e-5)
    return total_ours


def test_full_solution_level0():
    """Wait for the teleporter, ride it through limbo, walk to a goal arm."""
    acts = (
        [5] * 6          # wait out the teleporter delay
        + [1, 1]         # step up onto the teleporter
        + [5] * 10       # limbo freeze (orders + countdown)
        + [3] * 9        # along the T hallway
        + [2] * 5        # down the goal arm
        + [5] * 4        # post-goal timeout frames
    )
    run_lockstep(3, acts)


@pytest.mark.parametrize("seed", [4, 7, 42])
def test_random_walk_lockstep(seed):
    rng = np.random.RandomState(seed)
    acts = [int(a) for a in rng.randint(1, 6, 290)]
    run_lockstep(11 + seed, acts)


def test_no_delay_no_limbo_lockstep():
    """teleport_delay=0 keeps the teleporter visible from construction;
    limbo_time=0 takes the bypass branch (``t_maze.py:451-453``)."""
    rng = np.random.RandomState(3)
    acts = [int(a) for a in rng.randint(1, 6, 120)]
    run_lockstep(2, acts, teleport_delay=0, limbo_time=0)


def test_quit_mid_episode():
    acts = [5] * 4 + [6, 5, 5]
    total = run_lockstep(8, acts)
    assert total < 0


def test_timeout_terminates():
    total = run_lockstep(5, [5] * 60, timeout_frames=50)
    # Pure waiting: only existence penalties.
    assert total < 0


def test_cue_after_teleport_flag():
    acts = [5] * 6 + [1, 1] + [5] * 12
    run_lockstep(9, acts, cue_after_teleport=True)


@pytest.mark.parametrize("level", [1, 3])
def test_other_levels_lockstep(level):
    rng = np.random.RandomState(21 + level)
    acts = [5] * 6 + [1, 1] + [5] * 10 + [
        int(a) for a in rng.randint(1, 6, 80)
    ]
    run_lockstep(13 + level, acts, level=level)


def test_batched_vmap():
    env = TMaze(level=0, teleport_delay=2, limbo_time=3, timeout_frames=60)
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    states = jax.vmap(lambda k: env.initial_state(k))(keys)
    step = jax.jit(jax.vmap(env.step))
    rng = np.random.RandomState(0)
    for _ in range(30):
        states, outs = step(
            states, jnp.asarray(rng.randint(1, 6, 8), jnp.int32)
        )
    assert outs.reward.shape == (8,)
