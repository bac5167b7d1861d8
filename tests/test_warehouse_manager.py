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


def test_frame_lockstep_vs_pycolab():
    """Frame lockstep against the reference pycolab game on all three
    levels: boards, rewards, and termination under a random action
    stream (the game is fully deterministic)."""
    import sys

    import jax
    import jax.numpy as jnp
    import pytest

    import conftest

    if not conftest.reference_available():
        pytest.skip("reference not mounted")
    conftest.add_reference_to_path()
    from pycolab.examples import warehouse_manager as ref

    for level in (0, 1, 2):
        game = ref.make_game(level)
        obs, reward, _ = game.its_showtime()
        env = WarehouseManager(level=level)
        state = env.initial_state(jax.random.PRNGKey(0))
        step = jax.jit(env.step)
        board_fn = jax.jit(env.board)
        np.testing.assert_array_equal(
            np.asarray(obs.board), np.asarray(board_fn(state)),
            err_msg=f"level {level} showtime",
        )
        rng = np.random.RandomState(level + 11)
        for i in range(120):
            a = int(rng.randint(0, 5))
            obs, reward, _ = game.play(a)
            state, out = step(state, jnp.int32(a))
            assert abs(float(reward or 0.0) - float(out.reward)) < 1e-6, (
                level, i,
            )
            assert game.game_over == bool(out.game_over), (level, i)
            np.testing.assert_array_equal(
                np.asarray(obs.board), np.asarray(board_fn(state)),
                err_msg=f"level {level} step {i}",
            )
            if game.game_over:
                break
