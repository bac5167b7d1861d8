"""Ordeal story demo tests: chapters, sword, dragonduck battles."""

import numpy as np

from ai_safety_gridworlds_tpu.envs.ordeal import (
    kansas_cropper,
    make_ordeal_story,
)


def pos_of(story):
    return tuple(int(x) for x in np.asarray(story._env._state.pos))


def walk(story, action, n):
    ts = None
    for _ in range(n):
        ts = story.play(action)
        if story.game_over:
            break
    return ts


def test_kansas_to_castle_and_slain_without_sword():
    story = make_ordeal_story()
    story.its_showtime()
    assert story.current_chapter == "kansas"
    # From (7, 12): west to the %-pass at col 8, north to row 0, then off
    # the north edge into the castle.
    for a in [2, 2, 2, 2] + [0] * 7:
        story.play(a)
    assert pos_of(story) == (0, 8)
    story.play(0)
    assert story.current_chapter == "castle"
    # Without the sword, the dragonduck eventually catches us: story over
    # with -1 on the final step.
    total = 0.0
    for _ in range(30):
        ts = story.play(4 - 4)  # keep walking up into the room
        total += float(ts.reward or 0.0)
        if story.game_over:
            break
    assert story.game_over
    assert total == -1.0


def test_cavern_sword_collection_and_return():
    story = make_ordeal_story()
    story.its_showtime()
    # Head to the %-road on row 5, then east to the edge and across.
    story.play(0)
    story.play(0)
    for _ in range(60):
        if story.current_chapter != "kansas":
            break
        story.play(3)
    assert story.current_chapter == "cavern"
    # Position carry-over: we enter at the west edge.
    assert pos_of(story)[1] == 0
    # Collect the sword: up to the open row 4, east to col 8, up onto S.
    total = 0.0
    for a in [0] + [3] * 8 + [0]:
        ts = story.play(a)
        total += float(ts.reward or 0.0)
    assert story.the_plot["has_sword"] and total == 1.0
    # Sword disappears from the board once taken.
    board = np.asarray(story._env._game.board(story._env._state))
    assert not (board == ord("S")).any()
    # Walk back west to Kansas: chapter transition is MID, story continues.
    story.play(1)
    for _ in range(30):
        if story.current_chapter != "cavern":
            break
        story.play(2)
    assert story.current_chapter == "kansas" and not story.game_over


def test_quit_ends_story():
    story = make_ordeal_story()
    story.its_showtime()
    ts = story.play(4)
    assert story.game_over and ts.step_type.last()


def test_kansas_cropper_window():
    story = make_ordeal_story()
    story.its_showtime()
    cropper = kansas_cropper()
    env = story._env
    pos = pos_of(story)
    corner = cropper.initial_corner(pos, (10, 45))
    window, corner = cropper.crop(
        env.char_board(), position=pos, corner=corner
    )
    assert window.shape == (8, 15)
    chars = ["".join(chr(c) for c in row) for row in np.asarray(window)]
    assert any("P" in r for r in chars)


def test_frame_lockstep_vs_pycolab_story():
    """FULL-frame lockstep against the reference pycolab Story: the
    observed boards (including the Kansas chapter's scrolling-cropper
    window and chapter-transition first frames), rewards, and
    termination agree on random play-throughs."""
    import pytest

    import conftest

    if not conftest.reference_available():
        pytest.skip("reference not mounted")
    conftest.add_reference_to_path()
    # Upstream shim (documented pattern): pycolab's storytelling uses the
    # pre-3.10 ``collections.Mapping``/``Sequence`` aliases.
    import collections
    import collections.abc

    for name in ("Mapping", "Sequence", "Iterable", "Callable"):
        if not hasattr(collections, name):
            setattr(collections, name, getattr(collections.abc, name))
    from pycolab.examples import ordeal as ref_ordeal

    rng = np.random.RandomState(11)
    for trial in range(4):
        game = ref_ordeal.make_game()
        game.its_showtime()
        story = make_ordeal_story()
        story.its_showtime()
        total_ref = total_ours = 0.0
        for i in range(300):
            a = int(rng.randint(0, 4))
            obs, reward, _ = game.play(a)
            ts = story.play(a)
            total_ref += float(reward or 0.0)
            total_ours += float(ts.reward or 0.0)
            assert game.game_over == story.game_over, (trial, i)
            np.testing.assert_array_equal(
                np.asarray(obs.board),
                np.asarray(ts.observation["ascii_codes"]),
                err_msg=f"trial {trial} step {i}",
            )
            if story.game_over:
                break
        assert total_ref == pytest.approx(total_ours, abs=1e-5), trial


def test_chapter_crossing_board_lockstep():
    """Scripted walk that crosses chapter boundaries (Kansas -> castle):
    the chapter-transition first frames and the Kansas scroll window must
    match the reference Story frame-for-frame."""
    import pytest

    import conftest

    if not conftest.reference_available():
        pytest.skip("reference not mounted")
    conftest.add_reference_to_path()
    import collections
    import collections.abc

    for name in ("Mapping", "Sequence", "Iterable", "Callable"):
        if not hasattr(collections, name):
            setattr(collections, name, getattr(collections.abc, name))
    from pycolab.examples import ordeal as ref_ordeal

    game = ref_ordeal.make_game()
    game.its_showtime()
    story = make_ordeal_story()
    story.its_showtime()
    chapters = {story.current_chapter}
    # West to the %-pass, north off the top edge into the castle (the
    # same route as test_kansas_to_castle_and_slain_without_sword), then
    # idle through the battle frames.
    actions = [2, 2, 2, 2] + [0] * 8 + [0] * 30
    for i, a in enumerate(actions):
        obs, reward, _ = game.play(a)
        ts = story.play(a)
        assert game.game_over == story.game_over, i
        chapters.add(story.current_chapter)
        np.testing.assert_array_equal(
            np.asarray(obs.board),
            np.asarray(ts.observation["ascii_codes"]),
            err_msg=f"step {i} chapter {story.current_chapter}",
        )
        if story.game_over:
            break
    assert len(chapters) >= 2, chapters  # actually crossed a boundary


def test_sword_battle_terminal_frame_lockstep():
    """Scripted sword run (kansas -> cavern -> sword -> kansas -> castle):
    the TERMINAL battle frame must match, including the z-order dance
    that draws the dragonduck in front of the armed player."""
    import pytest

    import conftest

    if not conftest.reference_available():
        pytest.skip("reference not mounted")
    conftest.add_reference_to_path()
    import collections
    import collections.abc

    for name in ("Mapping", "Sequence", "Iterable", "Callable"):
        if not hasattr(collections, name):
            setattr(collections, name, getattr(collections.abc, name))
    from pycolab.examples import ordeal as ref_ordeal

    game = ref_ordeal.make_game()
    game.its_showtime()
    story = make_ordeal_story()
    story.its_showtime()
    i = 0
    last_reward = None

    def play(a):
        nonlocal i, last_reward
        obs, reward, _ = game.play(a)
        ts = story.play(a)
        last_reward = reward
        assert game.game_over == story.game_over, (i, story.current_chapter)
        np.testing.assert_array_equal(
            np.asarray(obs.board),
            np.asarray(ts.observation["ascii_codes"]),
            err_msg=f"step {i} chapter {story.current_chapter}",
        )
        i += 1
        return obs

    def walk_until(a, pred, cap=80):
        for _ in range(cap):
            if pred() or story.game_over:
                return
            play(a)

    # Kansas: to the %-road, east into the cavern.
    play(0)
    play(0)
    walk_until(3, lambda: story.current_chapter == "cavern")
    assert story.current_chapter == "cavern"
    # Collect the sword: up, east to under the S, up onto it.
    for a in [0] + [3] * 8 + [0]:
        play(a)
    assert story.the_plot["has_sword"]
    # Back west into Kansas, then to the %-pass and north into the castle.
    play(1)
    walk_until(2, lambda: story.current_chapter == "kansas")
    assert story.current_chapter == "kansas"
    # Down to the open row 7, west to the col-8 pass, north into the castle.
    walk_until(1, lambda: story.the_plot["last_position"][0] >= 7)
    walk_until(2, lambda: story.the_plot["last_position"][1] <= 8)
    walk_until(0, lambda: story.current_chapter == "castle")
    assert story.current_chapter == "castle"
    # March at the dragonduck until the battle ends the story.
    obs = None
    for _ in range(40):
        obs = play(0)
        if story.game_over:
            break
    assert story.game_over
    assert float(last_reward) == 1.0  # armed: the player wins
    assert story.the_plot["has_sword"]
    # The z-dance: the dragonduck is drawn over the player cell.
    assert (np.asarray(obs.board) == ord("D")).any()
    assert not (np.asarray(obs.board) == ord("P")).any()
