"""MazeWalker movement semantics, pinned directly against the reference
prefab (``pycolab/prefab_parts/sprites.py``): eight-direction dispatch,
the diagonal corner rule, board confinement, and off-board virtual
positions with the EDGE sentinel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import conftest
from ai_safety_gridworlds_tpu.core.movement import (
    MOTIONS_8,
    is_on_board,
    maze_walker_move,
)

ART = [
    "##########",
    "#  X   X #",
    "# X  XX  #",
    "#   X    #",
    "#  P   X #",
    "# XX  X  #",
    "#        #",
    "##########",
]
# Open board (no wall ring) for the unconfined walker: the sprite can
# leave the board and hold a virtual position where every cell reads as
# the EDGE sentinel.
ART_OPEN = [
    "          ",
    "  X    X  ",
    "   X  X   ",
    "    P     ",
    "  X   X   ",
    "          ",
]


def _impassable_lut(chars):
    lut = np.zeros(256, bool)
    for ch in chars:
        lut[ord(ch)] = True
    return jnp.asarray(lut)


@pytest.mark.parametrize(
    "art,confined", [(ART, True), (ART_OPEN, False)],
    ids=["confined", "virtual"],
)
def test_lockstep_vs_reference_prefab(art, confined):
    """Drive the reference MazeWalker through 400 random motions and
    assert our branch-free :func:`maze_walker_move` lands on the exact
    same (virtual) position each step, consuming the reference's own
    rendered boards."""
    if not conftest.reference_available():
        pytest.skip("reference not mounted")
    conftest.add_reference_to_path()
    from pycolab import ascii_art
    from pycolab.prefab_parts import sprites as prefab_sprites

    class Walker(prefab_sprites.MazeWalker):
        def __init__(self, corner, position, character):
            super().__init__(
                corner, position, character,
                impassable="#X", confined_to_board=confined,
            )

        def update(self, actions, board, layers, backdrop, things,
                   the_plot):
            if actions is None:
                return
            [self._north, self._northeast, self._east, self._southeast,
             self._south, self._southwest, self._west, self._northwest,
             self._stay][actions](board, the_plot)

    game = ascii_art.ascii_art_to_game(
        art, what_lies_beneath=" ", sprites={"P": Walker}
    )
    obs, _, _ = game.its_showtime()
    lut = _impassable_lut("#X")
    move = jax.jit(
        lambda p, m, b: maze_walker_move(p, m, b, lut, confined=confined)
    )
    sprite = game._sprites_and_drapes["P"]
    pos = np.array(sprite.virtual_position, np.int32)
    shape = np.asarray(obs.board).shape
    rng = np.random.RandomState(0)
    went_off_board = False
    for i in range(400):
        board_before = jnp.asarray(np.asarray(obs.board, np.uint8))
        a = int(rng.randint(0, 9))
        obs, _, _ = game.play(a)
        ref_pos = np.array(sprite.virtual_position, np.int32)
        new_pos, _ = move(jnp.asarray(pos), jnp.int32(a), board_before)
        np.testing.assert_array_equal(
            np.asarray(new_pos), ref_pos, err_msg=f"step {i} motion {a}"
        )
        pos = np.asarray(new_pos)
        on = bool(is_on_board(jnp.asarray(pos), shape))
        assert on == sprite.visible, (i, pos)
        went_off_board |= not on
    if not confined:
        assert went_off_board  # the walk must actually exercise EDGE


def test_corner_rule():
    """A diagonal is blocked iff its corner target is impassable OR both
    flanking cardinals are (``sprites.py:539-543``)."""
    lut = _impassable_lut("#")

    def board(rows):
        return jnp.asarray(
            np.array([[ord(c) for c in r] for r in rows], np.uint8)
        )

    pos = jnp.asarray(np.array([1, 1], np.int32))
    ne = jnp.int32(1)  # motion id 1 = NE = (-1, +1)

    # Corner free, one flank blocked: squeezing through is allowed.
    new_pos, moved = maze_walker_move(
        pos, ne, board(["## ", " P ", "   "]), lut
    )
    assert bool(moved) and tuple(np.asarray(new_pos)) == (0, 2)
    # Corner free, BOTH flanks blocked: no squeezing through.
    new_pos, moved = maze_walker_move(
        pos, ne, board(["## ", " P#", "   "]), lut
    )
    assert not bool(moved) and tuple(np.asarray(new_pos)) == (1, 1)
    # Corner blocked: always illegal.
    new_pos, moved = maze_walker_move(
        pos, ne, board(["  #", " P ", "   "]), lut
    )
    assert not bool(moved)
    # Stay always succeeds.
    _, moved = maze_walker_move(
        pos, jnp.int32(8), board(["###", "#P#", "###"]), lut
    )
    assert bool(moved)


def test_motion_table_matches_reference_order():
    # N, NE, E, SE, S, SW, W, NW, STAY (``sprites.py:141-149``).
    assert MOTIONS_8.tolist() == [
        [-1, 0], [-1, 1], [0, 1], [1, 1],
        [1, 0], [1, -1], [0, -1], [-1, -1],
        [0, 0],
    ]
