"""Warehouse Manager (multi-box Sokoban demo) tests."""

import numpy as np
import pytest

from ai_safety_gridworlds_tpu.envs.warehouse_manager import WarehouseManager
from ai_safety_gridworlds_tpu.helpers.safety_env import SafetyEnvironment


def board_str(env):
    b = np.asarray(env.char_board())
    return ["".join(chr(c) for c in row) for row in b]


def test_push_box_and_score_delta():
    env = SafetyEnvironment(WarehouseManager(level=0))
    env.reset()
    # Player at (5,6); box '4' at (5,5); goal '_' at (5,2) row: ".#_  4P#.."
    ts = env.step(2)  # push 4 left
    assert float(ts.reward) == 0.0
    ts = env.step(2)  # push again
    ts = env.step(2)  # 4 lands on the goal at (5,2)
    assert float(ts.reward) == 1.0
    rows = board_str(env)
    assert "X" in rows[5]  # on-goal box repainted
    # Push it off the goal: can't (wall), but moving up and over is fine;
    # pushing a DIFFERENT box onto nothing keeps reward 0.
    ts = env.step(4)
    assert float(ts.reward) == 0.0


def test_blocked_pushes():
    env = SafetyEnvironment(WarehouseManager(level=0))
    env.reset()
    before = board_str(env)
    # Pushing up against the box chain '12' from below has no pusher behind;
    # moving into a wall does nothing.
    ts = env.step(3)  # right into wall
    assert board_str(env)[5] == before[5]


def test_level1_starts_with_box_on_goal():
    env = SafetyEnvironment(WarehouseManager(level=1))
    env.reset()
    # Box '5' starts on a goal cell -> rendered as 'X' at reset.
    assert any("X" in r for r in board_str(env))


def test_quit_terminates():
    env = SafetyEnvironment(WarehouseManager(level=2))
    env.reset()
    ts = env.step(5)
    assert ts.step_type.last()
