"""Sequence Recall (Simon-style memory demo) tests."""

import numpy as np

from ai_safety_gridworlds_tpu.envs.sequence_recall import (
    GAME_ART,
    SequenceRecall,
)
from ai_safety_gridworlds_tpu.helpers.safety_env import SafetyEnvironment

# light id -> the action that walks from the center toward that pad
# (1=up 2=down 3=left 4=right).
_TOWARD = {0: 3, 1: 1, 2: 4, 3: 2}


def make_env(**kw):
    kw.setdefault("sequence_length", 2)
    kw.setdefault("demo_light_on_frames", 2)
    kw.setdefault("demo_light_off_frames", 1)
    kw.setdefault("pause_frames", 1)
    return SafetyEnvironment(SequenceRecall(**kw), seed=7)


def demo_steps(env):
    g = env._game
    return g.sequence_length * (g.off_frames + g.on_frames) + g.pause_frames


def bfs_actions(board_chars, start, target_pred, passable=None):
    """Shortest action path on the art grid ('#' impassable).

    ``passable`` restricts intermediate cells — during SEEK any pad entry
    resolves the turn, so routes must not clip a non-target pad.
    """
    from collections import deque

    h, w = len(board_chars), len(board_chars[0])
    prev = {tuple(start): None}
    q = deque([tuple(start)])
    moves = [(1, -1, 0), (2, 1, 0), (3, 0, -1), (4, 0, 1)]
    goal = None
    while q:
        r, c = q.popleft()
        if target_pred(board_chars[r][c]) and (r, c) != tuple(start):
            goal = (r, c)
            break
        for a, dr, dc in moves:
            nr, nc = r + dr, c + dc
            if not (0 <= nr < h and 0 <= nc < w):
                continue
            ch = board_chars[nr][nc]
            ok = ch != "#" and (
                passable is None or ch in passable or target_pred(ch)
            )
            if ok and (nr, nc) not in prev:
                prev[(nr, nc)] = ((r, c), a)
                q.append((nr, nc))
    assert goal is not None
    actions = []
    node = goal
    while prev[node] is not None:
        node, a = prev[node]
        actions.append(a)
    return list(reversed(actions))


def run_replay(env, wrong_first=False):
    """Drive the replay phase with a scripted perfect (or once-wrong) policy.

    Returns (per-step rewards, final timestep).
    """
    rewards = []
    ts = None
    seq = [int(x) for x in np.asarray(env._state.sequence)]
    if wrong_first:
        seq = [(seq[0] + 1) % 4] + seq[1:]
    # One stay to burn the first SEEK frame (the '%' curtain drops then).
    ts = env.step(5)
    rewards.append(float(ts.reward))
    pos = tuple(int(x) for x in np.asarray(env._state.pos))
    for g in seq:
        pad_char = "1234"[g]
        for a in bfs_actions(
            GAME_ART, pos, lambda ch: ch == pad_char, passable=" %P"
        ):
            ts = env.step(a)
            rewards.append(float(ts.reward))
        pos = tuple(int(x) for x in np.asarray(env._state.pos))
        # EXIT: step off the pad onto empty/'%' ground.
        for a in bfs_actions(GAME_ART, pos, lambda ch: ch in " %P"):
            ts = env.step(a)
            rewards.append(float(ts.reward))
            if ts.step_type.last():
                return rewards, ts
        pos = tuple(int(x) for x in np.asarray(env._state.pos))
    # QUIT state: two idle frames arm and fire the timeout.
    for _ in range(4):
        ts = env.step(5)
        rewards.append(float(ts.reward))
        if ts.step_type.last():
            break
    return rewards, ts


def test_demo_phase_freezes_agent_and_flashes_lights():
    env = make_env()
    env.reset()
    p0 = np.asarray(env._state.pos).copy()
    lights_seen = []
    prev = None
    for _ in range(demo_steps(env)):
        board = np.asarray(env._game.board(env._state))
        cur = next(
            (i for i, c in enumerate("1234") if (board == ord(c)).any()),
            None,
        )
        if cur is not None and prev is None:
            lights_seen.append(cur)
        prev = cur
        env.step(4)  # movement commands are ignored while frozen
    assert (np.asarray(env._state.pos) == p0).all()
    assert lights_seen == [int(x) for x in np.asarray(env._state.sequence)]


def test_masked_lights_and_wait_frame():
    env = make_env()
    env.reset()
    board = np.asarray(env._game.board(env._state))
    assert (board == ord("M")).any()  # curtain over the pads
    assert (board == ord("%")).any()  # wait box around the player
    for _ in range(demo_steps(env) + 2):
        env.step(5)
    board = np.asarray(env._game.board(env._state))
    assert (board == ord("%")).sum() == 0  # frame gone once seeking starts


def test_perfect_replay_scores_every_light():
    env = make_env()
    env.reset()
    for _ in range(demo_steps(env)):
        env.step(5)
    rewards, ts = run_replay(env)
    assert sum(r > 0.5 for r in rewards) == 2
    assert ts.step_type.last()


def test_wrong_pad_consumes_the_turn():
    env = make_env()
    env.reset()
    for _ in range(demo_steps(env)):
        env.step(5)
    rewards, ts = run_replay(env, wrong_first=True)
    assert sum(r > 0.5 for r in rewards) <= 1
    assert ts.step_type.last()


def test_step_penalty():
    env = make_env()
    env.reset()
    env.step(5)  # frame 1: no penalty yet
    ts = env.step(5)
    assert abs(float(ts.reward) + 0.005) < 1e-6


def test_quit_action_terminates():
    # A quit action arms a 1-frame timeout; the episode ends on the
    # FOLLOWING frame (reference ``timeout_frames`` handshake).
    env = make_env()
    env.reset()
    ts = env.step(0)
    assert not ts.step_type.last()
    ts = env.step(5)
    assert ts.step_type.last()


def test_timeout_frames():
    env = make_env(timeout_frames=5)
    env.reset()
    ts = None
    for _ in range(10):
        ts = env.step(5)
        if ts.step_type.last():
            break
    assert ts.step_type.last()
