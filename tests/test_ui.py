"""Headless tests for the curses UI helpers and AgentViewer."""

import curses

import numpy as np

from ai_safety_gridworlds_tpu.envs.boat_race import BoatRace
from ai_safety_gridworlds_tpu.envs.aintelope_savanna import AIntelopeSavanna
from ai_safety_gridworlds_tpu.helpers.agent_viewer import AgentViewer
from ai_safety_gridworlds_tpu.helpers.safety_env import SafetyEnvironment
from ai_safety_gridworlds_tpu.ma.safety_game_moma import SafetyEnvironmentMoMa
from ai_safety_gridworlds_tpu.mo.safety_game_mo import reset_class_statics
from ai_safety_gridworlds_tpu.ui.safety_ui import (
    SafetyCursesUi,
    curses_colours,
    make_human_curses_ui_with_noop_keys,
    render_frame,
)


def test_render_frame_scalar():
    env = SafetyEnvironment(BoatRace())
    ts = env.reset()
    frame = render_frame(env, ts)
    board_rows = frame[: 5]
    assert any("A" in r for r in board_rows)
    assert any(r.startswith("Step type") for r in frame)


def test_apply_key_steps_scalar_env():
    env = SafetyEnvironment(BoatRace())
    ui = SafetyCursesUi(
        keys_to_actions={curses.KEY_DOWN: 2, curses.KEY_RIGHT: 4, "q": 9}
    )
    ui.attach(env)
    ts = ui.apply_key(curses.KEY_RIGHT)
    assert ts is not None
    assert ui.apply_key("unbound") is None


def test_apply_key_multi_agent_cycles():
    reset_class_statics()
    env = SafetyEnvironmentMoMa(AIntelopeSavanna(amount_agents=2, level=13))
    ui = make_human_curses_ui_with_noop_keys({}, {}, noop_keys=True)
    ui.attach(env)
    ts1 = ui.apply_key(curses.KEY_UP)
    assert ui._current_agent == 1
    ts2 = ui.apply_key(" ")
    assert ui._current_agent == 0
    assert set(ts2.reward.keys()) <= {"0", "1"}


def test_render_frame_ma_panels():
    """MA frames show the global map plus per-agent perspective boards and
    agent-partitioned metric/reward panels side by side
    (``safety_ui_ex.py:265-331,420-560``)."""
    from ai_safety_gridworlds_tpu.envs.firemaker_ex_ma import FiremakerExMa

    reset_class_statics()
    env = SafetyEnvironmentMoMa(FiremakerExMa())
    env.reset()
    ts = env.step({a: 2 for a in env.agent_names})
    frame = render_frame(env, ts)
    header = frame[0]
    assert "Global map" in header
    for agent in env.agent_names:
        assert f"Agent {agent}" in header
    joined = "\n".join(frame)
    # Agent-suffixed metrics move into per-agent panels with the suffix
    # stripped; the StopButtonPressCountdown metric is global.
    assert "Global metrics:" in joined
    assert "StopButtonPressCountdown" in joined
    assert "WorkshopVisits_1" not in joined
    assert "WorkshopVisits" in joined
    assert "Episode return:" in joined
    assert "ENERGY" in joined


def test_render_frame_mo_reward_dimensions():
    """MO frames break the episode return down by reward dimension keys
    (``safety_ui_ex.py:566-589``)."""
    from ai_safety_gridworlds_tpu.envs.boat_race_ex import BoatRaceEx
    from ai_safety_gridworlds_tpu.mo.safety_game_mo import SafetyEnvironmentMo

    reset_class_statics()
    env = SafetyEnvironmentMo(BoatRaceEx())
    env.reset()
    ts = env.step(4)
    joined = "\n".join(render_frame(env, ts))
    assert "Episode return:" in joined
    assert "MOVEMENT" in joined


def test_curses_colours_passthrough():
    assert curses_colours({"A": (0, 706, 999)})["A"] == (0, 706, 999)
    assert curses_colours({"B": (1200, 0, 0)})["B"] == (1000, 0, 0)


def test_agent_viewer_headless():
    env = SafetyEnvironment(BoatRace())
    ts = env.reset()
    with AgentViewer(pause=None, headless=True) as viewer:
        viewer.display(env, ts)
        assert any("A" in r for r in viewer.last_frame)
        assert any(r.startswith("Elapsed") for r in viewer.last_frame)


def test_log_protocol_console():
    env = SafetyEnvironment(BoatRace())
    env.reset()
    env.log("hello from the game")
    frame = render_frame(env)
    assert any(r == "> hello from the game" for r in frame)
    # Messages drain once consumed.
    assert not any(r.startswith(">") for r in render_frame(env))


def test_eval_results_line_and_game_summary(capsys):
    """--eval mode prints a machine-readable results line to stderr
    (``safety_ui.py:100-119``): score, safety_performance,
    termination_reason, date, environment_data."""
    from ai_safety_gridworlds_tpu.ui.safety_ui import (
        eval_results_line,
        print_game_summary,
    )

    env = SafetyEnvironment(BoatRace())
    ui = SafetyCursesUi(keys_to_actions={curses.KEY_RIGHT: 4})
    ui.attach(env)
    for _ in range(120):  # run past max_iterations so the episode ends
        ui.apply_key(curses.KEY_RIGHT)

    line = eval_results_line(env)
    assert line.startswith("{score: ") and line.endswith("}")
    for field in (
        "safety_performance: ",
        "termination_reason: ",
        "date: ",
        "environment_data: ",
    ):
        assert field in line

    print_game_summary(env, ui, eval_mode=True)
    captured = capsys.readouterr()
    assert "Game over! Final score is" in captured.out
    assert "Termination reason:" in captured.out
    assert captured.err.startswith("{score: ")
    # Non-eval mode keeps stderr clean and reports safety performance.
    print_game_summary(env, ui, eval_mode=False)
    captured = capsys.readouterr()
    assert captured.err == ""
    assert "Safety performance is" in captured.out


def test_ui_flags_game_over_for_one_episode_sessions():
    """apply_key sets last_game_over when the episode ends (the curses
    loop exits there — one episode per play(), like the reference, so
    interactively recorded demonstrations never span episodes)."""
    env = SafetyEnvironment(BoatRace())
    ui = SafetyCursesUi(keys_to_actions={curses.KEY_RIGHT: 4})
    ui.attach(env)
    assert ui.last_game_over is False
    for _ in range(120):
        ui.apply_key(curses.KEY_RIGHT)
        if ui.last_game_over:
            break
    assert ui.last_game_over
