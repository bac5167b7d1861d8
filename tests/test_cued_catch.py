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
