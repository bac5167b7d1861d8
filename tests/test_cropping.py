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
