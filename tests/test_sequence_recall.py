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
    # A duration-d OFF/ON state occupies max(d, 2) frames: the entry
    # frame never completes (reference ``elif`` completion check). The
    # first OFF already counted its showtime tick, hence the -1.
    g = env._game
    eff = lambda d: max(d, 2)
    return g.sequence_length * (
        eff(g.off_frames) + eff(g.on_frames)
    ) + eff(g.pause_frames) - 1


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


def test_frame_lockstep_vs_pycolab():
    """Frame lockstep against the reference pycolab game: the reference's
    host-random light sequence is injected; boards, rewards, timing, and
    termination must agree across random action streams."""
    import importlib
    import os
    import random
    import sys

    import jax
    import jax.numpy as jnp
    import pytest

    import conftest

    if not conftest.reference_available():
        pytest.skip("reference not mounted")
    conftest.add_reference_to_path()
    sys.path.insert(
        0,
        os.path.join(
            conftest.REFERENCE_ROOT, "pycolab/examples/research/lp-rnn"
        ),
    )
    ref_sr = importlib.import_module("sequence_recall")

    # Upstream shims (documented pattern): the reference MaskDrape uses
    # ``np.bool`` (removed in numpy 1.24) and boolean ``-=`` (removed in
    # numpy 1.13+ semantics enforced by numpy 2).
    def _patched_set_up_masks(self, backdrop):
        self._all_off_mask = np.zeros_like(backdrop.curtain, dtype=bool)
        for g in "1234":
            mask = backdrop.curtain == backdrop.palette[g]
            self._mask_for_light[g] = mask
            self._all_off_mask |= mask

    _orig_update = ref_sr.MaskDrape.update

    def _patched_update(self, actions, board, layers, backdrop, things,
                        the_plot):
        if self._all_off_mask is None:
            self._set_up_masks(backdrop)
        state_ = the_plot["program"][0][0]
        args = the_plot["program"][0][1:]
        the_plot["frames_in_state"] += 1
        fis = the_plot["frames_in_state"]
        S = ref_sr._State
        pos = things["P"].position
        if state_ == S.QUIT:
            if fis == 1:
                the_plot["timeout_frames"] = 1
        elif state_ == S.OFF:
            if fis == 1:
                self.curtain[:] |= self._all_off_mask
            elif fis >= args[0]:
                the_plot["program"].pop(0)
                the_plot["frames_in_state"] = 0
        elif state_ == S.ON:
            if fis == 1:
                self.curtain[:] &= ~self._mask_for_light[args[1]]
            elif fis >= args[0]:
                the_plot["program"].pop(0)
                the_plot["frames_in_state"] = 0
        elif state_ == S.SEEK:
            agent_above = chr(backdrop.curtain[pos])
            if agent_above != " ":
                self.curtain[:] &= ~self._mask_for_light[agent_above]
                the_plot.add_reward(
                    1.0 if agent_above == args[0] else 0.0
                )
                the_plot["program"].pop(0)
                the_plot["frames_in_state"] = 0
        elif state_ == S.EXIT:
            agent_above = chr(backdrop.curtain[pos])
            if agent_above == " ":
                self.curtain[:] |= self._all_off_mask
                the_plot["program"].pop(0)
                the_plot["frames_in_state"] = 0

    ref_sr.MaskDrape._set_up_masks = _patched_set_up_masks
    ref_sr.MaskDrape.update = _patched_update

    for seed in (1, 4):
        random.seed(seed)
        kw = dict(
            sequence_length=2,
            demo_light_on_frames=2,
            demo_light_off_frames=1,
            pause_frames=1,
            timeout_frames=40,
        )
        game = ref_sr.make_game(**kw)
        obs, reward, _ = game.its_showtime()
        # The reference program embeds the sampled light sequence as the
        # ON states' light ids ('1'..'4').
        seq = [
            int(s[2]) - 1
            for s in game.the_plot["program"]
            if s[0] == ref_sr._State.ON
        ]
        assert len(seq) == 2
        env = SequenceRecall(**kw)
        state = env.initial_state(
            jax.random.PRNGKey(0), options={"sequence": seq}
        )
        step = jax.jit(env.step)
        board_fn = jax.jit(env.board)
        np.testing.assert_array_equal(
            np.asarray(obs.board), np.asarray(board_fn(state)),
            err_msg=f"seed {seed} showtime",
        )
        rng = np.random.RandomState(seed)
        total_ref = total_ours = 0.0
        for i in range(45):
            a = int(rng.randint(1, 6))
            obs, reward, _ = game.play(a)
            state, out = step(state, jnp.int32(a))
            total_ref += float(reward or 0.0)
            total_ours += float(out.reward)
            assert game.game_over == bool(out.game_over), (seed, i)
            np.testing.assert_array_equal(
                np.asarray(obs.board), np.asarray(board_fn(state)),
                err_msg=f"seed {seed} step {i}",
            )
            if game.game_over:
                break
        assert total_ref == pytest.approx(total_ours, abs=1e-5), seed
