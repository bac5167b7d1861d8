"""Vectorized MazeWalker-style movement.

Re-implements the legality semantics of the reference prefab
(``pycolab/prefab_parts/sprites.py:479-546``) as branch-free gathers suitable
for ``jit``/``vmap``:

* cardinal motions (:func:`attempt_move`/:func:`attempt_move_masked`) — the
  target cell is checked against an impassable char set on the *currently
  rendered board*, with board-edge confinement (used by the safety suite,
  ``safety_game.py:400-432``);
* the full eight-direction dispatch with the diagonal corner rule and
  off-board "virtual" positions (:func:`maze_walker_move`) — a diagonal
  motion is blocked when its own corner cell is impassable OR both flanking
  cardinal cells are (``sprites.py:539-543``); an unconfined walker may hold
  a virtual position outside the board (``sprites.py:197-209``), where every
  off-board cell reads as the ``EDGE`` sentinel (``sprites.py:137``) — a
  pseudo-character that blocks only confined walkers.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Eight single-step motions + stay, indexed 0..8 in pycolab's class order
# (``sprites.py:141-149``): N, NE, E, SE, S, SW, W, NW, STAY.
MOTIONS_8 = np.array(
    [
        (-1, 0), (-1, 1), (0, 1), (1, 1),
        (1, 0), (1, -1), (0, -1), (-1, -1),
        (0, 0),
    ],
    dtype=np.int32,
)


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


def _cell_impassable(pos, board, impassable_lut, confined):
    """Whether the cell at ``pos`` blocks a walker: off-board cells are the
    EDGE sentinel (impassable only when confined, ``sprites.py:505-509``);
    on-board cells consult the impassable char LUT on the rendered board."""
    h, w = board.shape
    r, c = pos[0], pos[1]
    on_board = (r >= 0) & (r < h) & (c >= 0) & (c < w)
    rr = jnp.clip(r, 0, h - 1)
    cc = jnp.clip(c, 0, w - 1)
    char_blocks = impassable_lut[board[rr, cc]]
    if confined:
        return ~on_board | (on_board & char_blocks)
    return on_board & char_blocks


def maze_walker_move(pos, motion_id, board, impassable_lut, confined=True):
    """Full MazeWalker motion: eight directions, corner rule, virtual
    positions.

    Args:
      pos: int32 [2] current VIRTUAL (row, col) — may be off-board for an
        unconfined walker.
      motion_id: int32 [] index into :data:`MOTIONS_8` (8 = stay).
      board: uint8 [H, W] rendered board.
      impassable_lut: bool [256] impassable char codes.
      confined: board edges block when True (``_confined_to_board``).

    Returns:
      (new_pos int32 [2], moved bool []): ``new_pos == pos`` when blocked;
      staying put always "succeeds" (``sprites.py:516-517``).

    Legality (``sprites.py:531-546``): a cardinal motion is blocked iff its
    target cell is impassable; a diagonal motion is blocked iff its corner
    target is impassable, or BOTH flanking cardinal cells are.
    """
    motions = jnp.asarray(MOTIONS_8)
    m = jnp.clip(jnp.asarray(motion_id, jnp.int32), 0, 8)
    delta = motions[m]
    target = pos + delta

    target_blocked = _cell_impassable(target, board, impassable_lut, confined)
    # Flanking cardinal cells for the diagonal corner rule.
    row_side = pos + jnp.stack([delta[0], jnp.int32(0)])
    col_side = pos + jnp.stack([jnp.int32(0), delta[1]])
    row_blocked = _cell_impassable(row_side, board, impassable_lut, confined)
    col_blocked = _cell_impassable(col_side, board, impassable_lut, confined)

    is_diag = (delta[0] != 0) & (delta[1] != 0)
    is_stay = (delta[0] == 0) & (delta[1] == 0)
    blocked = jnp.where(
        is_diag,
        target_blocked | (row_blocked & col_blocked),
        target_blocked,
    )
    legal = is_stay | ~blocked
    new_pos = jnp.where(legal, target, pos)
    return new_pos, legal


def is_on_board(pos, shape) -> jnp.ndarray:
    """Whether a virtual position is on the board (the walker is visible,
    ``sprites.py:197-209``)."""
    h, w = shape
    return (
        (pos[0] >= 0) & (pos[0] < h) & (pos[1] >= 0) & (pos[1] < w)
    )
