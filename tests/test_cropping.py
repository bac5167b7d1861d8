"""Cropper tests (pycolab cropping.py equivalents)."""

import numpy as np
import pytest

from ai_safety_gridworlds_tpu.core import art
from ai_safety_gridworlds_tpu.core.cropping import (
    FixedCropper,
    ObservationCropper,
    ScrollingCropper,
)

BOARD = art.art_to_uint8(
    [
        "##########",
        "#A       #",
        "#  B     #",
        "#        #",
        "#      C #",
        "##########",
    ]
)


def as_art(window):
    return ["".join(chr(c) for c in row) for row in np.asarray(window)]


def test_base_cropper_passthrough():
    assert np.array_equal(ObservationCropper().crop(BOARD), BOARD)


def test_fixed_cropper_interior():
    w = FixedCropper((1, 1), 2, 4).crop(BOARD)
    assert as_art(w) == ["A   ", "  B "]


def test_fixed_cropper_pads_outside():
    w = FixedCropper((-1, -2), 3, 5, pad_char="*").crop(BOARD)
    assert as_art(w) == ["*****", "**###", "**#A "]


def test_fixed_cropper_requires_pad_for_oob():
    with pytest.raises(ValueError):
        FixedCropper((4, 8), 4, 4).crop(BOARD)


def test_scrolling_cropper_tracks_and_scrolls():
    cropper = ScrollingCropper(3, 5, pad_char="*", scroll_margins=(1, 1))
    pos = (1, 1)  # 'A'
    corner = cropper.initial_corner(pos, BOARD.shape)
    w, corner = cropper.crop(BOARD, position=pos, corner=corner)
    # A stays in view, window clamped onto the board (no pad visible when
    # clamping is possible).
    assert "A" in "".join(as_art(w))
    # Move the tracked entity right; the window scrolls to keep margins.
    for col in range(2, 8):
        w, corner = cropper.crop(BOARD, position=(1, col), corner=corner)
        window_cols = range(corner[1], corner[1] + 5)
        assert col in window_cols
        assert col - corner[1] >= 1 or corner[1] == 0


def test_scrolling_cropper_saccade_jump():
    cropper = ScrollingCropper(3, 5, pad_char="*", scroll_margins=(1, 1))
    corner = cropper.initial_corner((1, 1), BOARD.shape)
    # Teleport far away: saccade centres the window on the new position.
    w, corner = cropper.crop(BOARD, position=(4, 7), corner=corner)
    assert corner == (3, 5)
    assert "C" in "".join(as_art(w))


def test_scrolling_cropper_centred_requires_odd():
    with pytest.raises(ValueError):
        ScrollingCropper(4, 5, scroll_margins=(None, 1))


def test_fixed_cropper_far_outside_board_is_all_padding():
    """A padded window lying further outside the board than its own size
    must be pure padding (the shared pad-and-slice helper would clamp)."""
    import numpy as np

    from ai_safety_gridworlds_tpu.core.cropping import FixedCropper

    board = np.full((4, 4), ord("x"), np.uint8)
    crop = FixedCropper((-7, 0), rows=5, cols=5, pad_char="#")
    out = np.asarray(crop.crop(board))
    assert (out == ord("#")).all()
    # Partial overlap keeps exact alignment.
    crop2 = FixedCropper((-2, -2), rows=5, cols=5, pad_char="#")
    out2 = np.asarray(crop2.crop(board))
    assert (out2[:2, :] == ord("#")).all() and (out2[:, :2] == ord("#")).all()
    assert (out2[2:, 2:] == ord("x")).all()


def test_lockstep_vs_reference_croppers():
    """Drive the reference FixedCropper/ScrollingCropper over a live
    pycolab game for 200 random steps per configuration and assert our
    functional croppers produce identical windows (incl. out-of-board
    padding, margin scrolling, centred tracking, and saccade jumps)."""
    import jax.numpy as jnp
    import pytest

    import conftest

    if not conftest.reference_available():
        pytest.skip("reference not mounted")
    conftest.add_reference_to_path()
    from pycolab import ascii_art
    from pycolab import cropping as ref_crop
    from pycolab.prefab_parts import sprites as prefab_sprites

    art = [
        "####################",
        "#        X         #",
        "#  X        X      #",
        "#     P            #",
        "#        X     X   #",
        "#   X              #",
        "#            X     #",
        "#                  #",
        "####################",
    ]

    class Walker(prefab_sprites.MazeWalker):
        def __init__(self, corner, position, character):
            super().__init__(
                corner, position, character,
                impassable="#X", confined_to_board=True,
            )

        def update(self, actions, board, layers, backdrop, things,
                   the_plot):
            if actions is None:
                return
            [self._north, self._east, self._south, self._west,
             self._stay][actions](board, the_plot)

    def run(ref_cropper, ours, scroll, seed=3):
        game = ascii_art.ascii_art_to_game(
            art, what_lies_beneath=" ", sprites={"P": Walker}
        )
        ref_cropper.set_engine(game)
        obs, _, _ = game.its_showtime()
        sprite = game._sprites_and_drapes["P"]
        rng = np.random.RandomState(seed)
        corner = None
        for i in range(200):
            ref_obs = ref_cropper.crop(obs)
            board = jnp.asarray(np.asarray(obs.board, np.uint8))
            if scroll:
                pos = jnp.asarray(np.array(sprite.position, np.int32))
                out, corner = ours.crop(
                    board, position=pos, corner=corner
                )
            else:
                out = ours.crop(board)
            np.testing.assert_array_equal(
                np.asarray(ref_obs.board), np.asarray(out),
                err_msg=f"step {i}",
            )
            obs, _, _ = game.play(int(rng.randint(0, 5)))

    for tl, (r, c) in [
        ((2, 3), (5, 8)),      # interior window
        ((0, 0), (9, 20)),     # whole board
        ((-2, -3), (6, 10)),   # hangs off the top-left
        ((5, 14), (8, 12)),    # hangs off the bottom-right
    ]:
        run(
            ref_crop.FixedCropper(tl, r, c, pad_char=" "),
            FixedCropper(tl, r, c, pad_char=" "),
            scroll=False,
        )

    for kw in [
        {},                                           # reference defaults
        dict(scroll_margins=(1, 2)),
        dict(pad_char=" ", scroll_margins=(None, None)),  # centred
        dict(scroll_margins=(1, 1), saccade=True),
        dict(scroll_margins=(1, 1), saccade=False),
    ]:
        rows, cols = (3, 5) if kw.get("scroll_margins") == (None, None) \
            else (5, 7)
        run(
            ref_crop.ScrollingCropper(rows, cols, to_track=["P"], **kw),
            ScrollingCropper(rows, cols, **kw),
            scroll=True,
        )
