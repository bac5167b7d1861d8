"""Vectorized MazeWalker-style movement.

Re-implements the legality semantics of the reference prefab
(``pycolab/prefab_parts/sprites.py:479-546``: target cell checked against an
impassable char set on the *currently rendered board*, board-edge confinement)
as branch-free gathers suitable for ``jit``/``vmap``. Only cardinal motions
are needed by the safety suite (``safety_game.py:400-432`` dispatches
UP/DOWN/LEFT/RIGHT only).
"""

from __future__ import annotations

import jax.numpy as jnp


def attempt_move(pos, delta, board, impassable_lut, confined=True):
    """Move a sprite by ``delta`` if legal; return (new_pos, moved).

    Args:
      pos: int32 [2] current (row, col).
      delta: int32 [2] displacement (from an action-delta LUT).
      board: uint8 [H, W] currently rendered board (chars as codes). Legality
        consults the rendered board, exactly as the reference ``_check_motion``
        does via ``chr(board[new_row, new_col])``.
      impassable_lut: bool [256] True for impassable char codes.
      confined: if True the board edge blocks motion (reference
        ``_confined_to_board``; safety sprites are always confined because the
        maps are wall-ringed, but keep the flag for generality).

    Returns:
      new_pos: int32 [2]; equals ``pos`` when the move is illegal.
      moved: bool scalar, True when the move was carried out.
    """
    h, w = board.shape
    target = pos + delta
    in_bounds = (
        (target[0] >= 0) & (target[0] < h) & (target[1] >= 0) & (target[1] < w)
    )
    # Clamp the gather index so it is always valid; the result is only used
    # when in_bounds is True.
    tr = jnp.clip(target[0], 0, h - 1)
    tc = jnp.clip(target[1], 0, w - 1)
    blocked_by_char = impassable_lut[board[tr, tc]]
    legal = in_bounds & ~blocked_by_char
    if not confined:
        legal = legal | ~in_bounds  # off-board moves allowed when unconfined
    new_pos = jnp.where(legal, target, pos)
    return new_pos, legal


def attempt_move_masked(pos, delta, blocked, confined=True):
    """Like :func:`attempt_move` but with a precomputed bool [H, W] blocked mask.

    Useful when the obstacle set is static (walls only) and the board render
    can be skipped on the legality path.
    """
    h, w = blocked.shape
    target = pos + delta
    in_bounds = (
        (target[0] >= 0) & (target[0] < h) & (target[1] >= 0) & (target[1] < w)
    )
    tr = jnp.clip(target[0], 0, h - 1)
    tc = jnp.clip(target[1], 0, w - 1)
    legal = in_bounds & ~blocked[tr, tc]
    if not confined:
        legal = legal | ~in_bounds
    new_pos = jnp.where(legal, target, pos)
    return new_pos, legal
