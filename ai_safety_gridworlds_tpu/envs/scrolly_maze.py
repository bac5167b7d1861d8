"""Scrolly maze: a large world explored through an egocentric window.

Functional re-implementation of pycolab's scrolling-world demo
(``pycolab/examples/scrolly_maze.py``): a big maze with collectable coins
('@', +100 each; collecting the last one wins), horizontal patrollers
('a','b','c') that move every second frame, reverse at walls
(``scrolly_maze.py:274-305``), and end the episode on contact with the
player. Where pycolab uses the Scrolly drape + scrolling protocol to slide
the whole world under a fixed window, the TPU rebuild keeps the world static
in device memory and produces the egocentric view with
:class:`~ai_safety_gridworlds_tpu.core.cropping.ScrollingCropper` (same
observable behavior, compiler-friendly state).

Actions: 0=up 1=down 2=left 3=right 4=stay 5=quit
(``scrolly_maze.py:352-364``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from ai_safety_gridworlds_tpu.core import art
from ai_safety_gridworlds_tpu.core.base import EngineStep, SafetyGridworld
from ai_safety_gridworlds_tpu.core.movement import attempt_move_masked
from ai_safety_gridworlds_tpu.core.render import paint_sprite, rgb_map, value_map
from ai_safety_gridworlds_tpu.core.timestep import TerminationReason

MAZE_ART = [
    "##############################",
    "#P    #       @   #       @  #",
    "# ### # ######### # ####### ##",
    "# #@# #     a     # #     #  #",
    "# # # ##### ### ### # ### ## #",
    "# # #     # #@#   # # #@#    #",
    "# # ##### # # ### # # # #### #",
    "# #     # # #   b   # #    # #",
    "# ##### # # ####### # #### # #",
    "#     # # #       # #    # # #",
    "##### # # ####### # #### # # #",
    "#@  # # #    c    #    # # #@#",
    "# # # # ####### ###### # # # #",
    "# #   #         #      #   # #",
    "##############################",
]

PLAYER_CHR = "P"
COIN_CHR = "@"
WALL_CHR = "#"
PATROLLER_CHRS = "abc"

_DELTAS = np.array(
    [(-1, 0), (1, 0), (0, -1), (0, 1), (0, 0)], np.int32
)

GAME_BG_COLOURS = {
    WALL_CHR: (599, 599, 599),
    " ": (858, 858, 858),
    PLAYER_CHR: (0, 706, 999),
    COIN_CHR: (999, 862, 110),
    "a": (999, 0, 780),
    "b": (145, 999, 0),
    "c": (252, 0, 999),
}


@struct.dataclass
class ScrollyMazeState:
    t: jnp.ndarray
    key: jnp.ndarray
    pos: jnp.ndarray  # int32 [2]
    coins: jnp.ndarray  # bool [H, W]
    patrol_pos: jnp.ndarray  # int32 [n_patrol, 2]
    patrol_east: jnp.ndarray  # bool [n_patrol]


class ScrollyMaze(SafetyGridworld):
    """Big-world maze with patrollers and coins (``scrolly_maze.py``)."""

    name = "scrolly_maze"
    action_min = 0
    action_max = 5

    def __init__(self, max_iterations: int = 1000):
        self.max_iterations = max_iterations
        board0 = art.art_to_uint8(MAZE_ART)
        self._start_pos = art.position_of(board0, PLAYER_CHR)
        self._wall_mask = art.char_mask(board0, WALL_CHR)
        self._coins0 = art.char_mask(board0, COIN_CHR)
        self._patrol0 = np.stack(
            [art.position_of(board0, c) for c in PATROLLER_CHRS]
        )
        # Initial heading from the character parity (``scrolly_maze.py:282``).
        self._patrol_east0 = np.array(
            [bool(ord(c) % 2) for c in PATROLLER_CHRS]
        )
        self._backdrop = art.replace_chars(
            board0, PLAYER_CHR + COIN_CHR + PATROLLER_CHRS, " "
        )
        value_mapping = {WALL_CHR: 0.0, " ": 1.0, COIN_CHR: 2.0,
                         PLAYER_CHR: 3.0}
        for i, c in enumerate(PATROLLER_CHRS):
            value_mapping[c] = 4.0 + i
        self._value_lut = art.char_lut(value_mapping)
        self._rgb_lut = art.rgb_lut_from_colours(GAME_BG_COLOURS)

    def _patrol_move(self, ppos, east, wall):
        """One patroller sweep: reverse when facing a wall, then step
        (``scrolly_maze.py:292-303``)."""
        ahead_col = ppos[:, 1] + jnp.where(east, 1, -1)
        next_to_wall = wall[ppos[:, 0], ahead_col]
        east = east ^ next_to_wall
        step_col = ppos[:, 1] + jnp.where(east, 1, -1)
        blocked = wall[ppos[:, 0], step_col]
        ppos = ppos.at[:, 1].set(
            jnp.where(blocked, ppos[:, 1], step_col)
        )
        return ppos, east

    def initial_state(self, key, options=None) -> ScrollyMazeState:
        # its_showtime sweep: patrollers move at frame 0 (the reference's
        # ``the_plot.frame % 2`` gate is falsy at showtime).
        wall = jnp.asarray(self._wall_mask)
        ppos, east = self._patrol_move(
            jnp.asarray(self._patrol0),
            jnp.asarray(self._patrol_east0),
            wall,
        )
        return ScrollyMazeState(
            t=jnp.int32(0),
            key=key,
            pos=jnp.asarray(self._start_pos),
            coins=jnp.asarray(self._coins0),
            patrol_pos=ppos,
            patrol_east=east,
        )

    def engine_step(self, state: ScrollyMazeState, action, options=None):
        is_quit = action == 5
        wall = jnp.asarray(self._wall_mask)

        delta = jnp.asarray(_DELTAS)[jnp.clip(action, 0, 4)]
        new_pos, _ = attempt_move_masked(state.pos, delta, wall)
        new_pos = jnp.where(is_quit, state.pos, new_pos)

        # Coin pickup (``scrolly_maze.py:344-351``).
        on_coin = state.coins[new_pos[0], new_pos[1]]
        coins = state.coins.at[new_pos[0], new_pos[1]].set(False)
        reward = jnp.where(on_coin, 100.0, 0.0)
        all_collected = ~jnp.any(coins)

        # Patrollers: move east/west on EVEN frames only (the showtime
        # sweep was frame 0), reverse at walls, and kill when THEY move
        # onto the player's PRE-move cell — patrollers update before 'P'
        # in the reference schedule [['#'], ['a','b','c','P'], ['@']], so
        # they read the player's last-frame position, and a stationary
        # patroller never kills (``scrolly_maze.py:284-305``).
        frame = state.t  # base.step already advanced to the current frame
        moving_turn = (frame % 2) == 0
        moved_ppos, moved_east = self._patrol_move(
            state.patrol_pos, state.patrol_east, wall
        )
        ppos = jnp.where(moving_turn, moved_ppos, state.patrol_pos)
        east = jnp.where(moving_turn, moved_east, state.patrol_east)

        caught = moving_turn & jnp.any(
            (ppos[:, 0] == state.pos[0]) & (ppos[:, 1] == state.pos[1])
        )
        terminated = is_quit | all_collected | caught

        state = state.replace(
            pos=new_pos,
            coins=coins,
            patrol_pos=ppos,
            patrol_east=east,
        )
        return state, EngineStep.make(
            jnp.asarray(reward, jnp.float32),
            terminated=terminated,
            termination_reason=jnp.where(
                is_quit,
                jnp.int32(TerminationReason.QUIT),
                jnp.where(
                    terminated,
                    jnp.int32(TerminationReason.TERMINATED),
                    jnp.int32(TerminationReason.NONE),
                ),
            ),
            discount=0.0,
            actual_action=action,
        )

    def board(self, state):
        board = jnp.asarray(self._backdrop)
        board = jnp.where(state.coins, jnp.uint8(ord(COIN_CHR)), board)
        for i, c in enumerate(PATROLLER_CHRS):
            board = paint_sprite(board, state.patrol_pos[i], ord(c))
        return paint_sprite(board, state.pos, ord(PLAYER_CHR))

    def observe(self, state) -> dict:
        board = self.board(state)
        return {
            "board": value_map(board, jnp.asarray(self._value_lut)),
            "RGB": rgb_map(board, jnp.asarray(self._rgb_lut)),
            "ascii_codes": board,
        }
