"""Cued Catch (memory association demo) tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ai_safety_gridworlds_tpu.envs.cued_catch import (
    BALL_COL,
    PLAYER_COL,
    CuedCatch,
)
from ai_safety_gridworlds_tpu.helpers.safety_env import SafetyEnvironment


def make_env(**kw):
    kw.setdefault("initial_cue_duration", 2)
    kw.setdefault("cue_duration", 3)
    kw.setdefault("num_trials", 5)
    return SafetyEnvironment(CuedCatch(**kw), seed=1)


def test_programming_phase_then_trials():
    env = make_env()
    env.reset()
    # Programming phase: 4 cues x 2 steps; balls invisible.
    board = np.asarray(env._game.board(env._state))
    assert ord("a") not in board and ord("b") not in board
    for _ in range(8):
        env.step(3)
    # Trial phase: balls appear and march left.
    board = np.asarray(env._game.board(env._state))
    assert (board == ord("a")).any() and (board == ord("b")).any()
    env.step(3)  # first trial-phase step initialises the trial (col resets)
    c0 = int(np.asarray(env._state.ball_col))
    env.step(3)
    assert int(np.asarray(env._state.ball_col)) == c0 - 1


def test_memorised_policy_scores_every_trial():
    env = make_env()
    env.reset()
    cues_to_balls = np.asarray(env._state.cues_to_balls)
    for _ in range(8):
        env.step(3)
    total = 0.0
    steps = 0
    ts = None
    while steps < 300:
        cue = int(np.asarray(env._state.cue_choice))
        correct_row = 1 + int(cues_to_balls[cue]) if cue >= 0 else 1
        row = int(np.asarray(env._state.player_row))
        action = 1 if correct_row < row else (2 if correct_row > row else 3)
        ts = env.step(action)
        total += float(ts.reward)
        steps += 1
        if ts.step_type.last():
            break
    assert ts.step_type.last()
    assert total == 5.0  # one point per trial, all five caught


def test_wrong_row_scores_nothing():
    env = make_env()
    env.reset()
    cues_to_balls = np.asarray(env._state.cues_to_balls)
    for _ in range(8):
        env.step(3)
    total = 0.0
    steps = 0
    while steps < 300:
        cue = int(np.asarray(env._state.cue_choice))
        correct_row = 1 + int(cues_to_balls[cue]) if cue >= 0 else 1
        wrong_row = 3 - correct_row
        row = int(np.asarray(env._state.player_row))
        action = 1 if wrong_row < row else (2 if wrong_row > row else 3)
        ts = env.step(action)
        total += float(ts.reward)
        steps += 1
        if ts.step_type.last():
            break
    assert total == 0.0


def test_reward_free_trials():
    env = make_env(reward_free_trials=3)
    env.reset()
    cues_to_balls = np.asarray(env._state.cues_to_balls)
    for _ in range(8):
        env.step(3)
    total = 0.0
    steps = 0
    while steps < 300:
        cue = int(np.asarray(env._state.cue_choice))
        correct_row = 1 + int(cues_to_balls[cue]) if cue >= 0 else 1
        row = int(np.asarray(env._state.player_row))
        action = 1 if correct_row < row else (2 if correct_row > row else 3)
        ts = env.step(action)
        total += float(ts.reward)
        steps += 1
        if ts.step_type.last():
            break
    assert total == 2.0  # 5 trials minus 3 reward-free


def test_quit_action():
    env = make_env()
    env.reset()
    ts = env.step(0)
    assert ts.step_type.last()


def test_frame_lockstep_vs_pycolab():
    """Frame lockstep against the reference pycolab game: host-random
    cue->ball mapping and per-trial cue choices injected from the
    reference; boards, rewards, and phase timing must agree."""
    import random

    import pytest

    import conftest

    if not conftest.reference_available():
        pytest.skip("reference not mounted")
    conftest.add_reference_to_path()
    import importlib
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(
            conftest.REFERENCE_ROOT, "pycolab/examples/research/lp-rnn"
        ),
    )
    ref_cc = importlib.import_module("cued_catch")

    random.seed(5)
    game = ref_cc.make_game(
        initial_cue_duration=3, cue_duration=4, num_trials=5
    )
    obs, reward, _ = game.its_showtime()
    # Upstream shim (documented pattern): the reference compares
    # ``the_plot.get('last_ball_reset')`` (None before any reset) against
    # an int, which raises on Python 3.
    game.the_plot["last_ball_reset"] = -float("inf")
    drape = game.things["Q"]
    # Second upstream shim: ``_show_cue(None)`` evaluates
    # ``0 <= None`` on Python 3.
    _orig_show_cue = drape._show_cue

    def _safe_show_cue(cue=None):
        if cue is None:
            drape.curtain[-2:, :] = False
        else:
            _orig_show_cue(cue)

    drape._show_cue = _safe_show_cue
    mapping = [
        0 if b == "top" else 1 for b in drape._cues_to_balls
    ]

    env = CuedCatch(
        initial_cue_duration=3, cue_duration=4, num_trials=5
    )
    state = env.initial_state(
        jax.random.PRNGKey(0), options={"cues_to_balls": mapping}
    )
    step = jax.jit(env.step)
    board_fn = jax.jit(env.board)
    np.testing.assert_array_equal(
        np.asarray(obs.board), np.asarray(board_fn(state)),
        err_msg="showtime",
    )
    rng = np.random.RandomState(2)
    total_ref = total_ours = 0.0
    for i in range(80):
        a = int(rng.randint(1, 4))  # up/down/stay
        obs, reward, _ = game.play(a)
        opts = {"cue_choice": int(drape._second_phase_cue_choice)}
        state, out = step(state, jnp.int32(a), opts)
        total_ref += float(reward or 0.0)
        total_ours += float(out.reward)
        assert game.game_over == bool(out.game_over), i
        np.testing.assert_array_equal(
            np.asarray(obs.board), np.asarray(board_fn(state)),
            err_msg=f"step {i}",
        )
        if game.game_over:
            break
    assert total_ref == pytest.approx(total_ours, abs=1e-5)
