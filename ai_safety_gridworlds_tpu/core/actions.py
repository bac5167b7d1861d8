"""Action and direction enums for the safety gridworld suite.

Two action orderings exist in the reference suite and both are kept here:

* ``Actions`` — the ordering used by the original DeepMind scalar suite
  (reference: ``ai_safety_gridworlds/environments/shared/safety_game.py:42-55``):
  NOOP=0, UP=1, DOWN=2, LEFT=3, RIGHT=4, QUIT=9.
* ``ActionsMo`` — the ordering used by the fork's multi-objective suite
  (reference: ``safety_game_mo_base.py:76-93``): NOOP=0, LEFT=1, RIGHT=2,
  UP=3, DOWN=4, TURN_LEFT_90=5 .. TURN_RIGHT_180=8, QUIT=9.

Movement deltas are exposed as dense int32 lookup tables indexed by action id
so that the per-step kernel is a gather, never Python control flow.
"""

from __future__ import annotations

import enum

import numpy as np


class Actions(enum.IntEnum):
    """Actions of the original (scalar) safety suite."""

    NOOP = 0
    UP = 1
    DOWN = 2
    LEFT = 3
    RIGHT = 4
    # Human only.
    QUIT = 9


class ActionsMo(enum.IntEnum):
    """Actions of the extended multi-objective suite."""

    NOOP = 0
    LEFT = 1
    RIGHT = 2
    UP = 3
    DOWN = 4
    TURN_LEFT_90 = 5
    TURN_RIGHT_90 = 6
    TURN_LEFT_180 = 7
    TURN_RIGHT_180 = 8
    # Human only.
    QUIT = 9


class Directions(enum.IntEnum):
    """Absolute facing directions (reference: safety_game_mo_base.py:62-74)."""

    LEFT = 0
    RIGHT = 1
    UP = 2
    DOWN = 3


DEFAULT_ACTION_SET = [Actions.UP, Actions.DOWN, Actions.LEFT, Actions.RIGHT]
DEFAULT_ACTION_SET_MO = [
    ActionsMo.LEFT,
    ActionsMo.RIGHT,
    ActionsMo.UP,
    ActionsMo.DOWN,
]

# (row, col) displacement per action id; rows grow downward. QUIT and any
# unused ids map to (0, 0). Tables cover ids 0..9 inclusive.
_N_ACTION_IDS = 10


def _delta_table(mapping: dict[int, tuple[int, int]]) -> np.ndarray:
    table = np.zeros((_N_ACTION_IDS, 2), dtype=np.int32)
    for action_id, (dr, dc) in mapping.items():
        table[action_id] = (dr, dc)
    return table


# Movement deltas for the original ordering.
ACTION_DELTAS = _delta_table(
    {
        int(Actions.UP): (-1, 0),
        int(Actions.DOWN): (1, 0),
        int(Actions.LEFT): (0, -1),
        int(Actions.RIGHT): (0, 1),
    }
)

# Movement deltas for the multi-objective ordering (turn actions don't move).
ACTION_DELTAS_MO = _delta_table(
    {
        int(ActionsMo.UP): (-1, 0),
        int(ActionsMo.DOWN): (1, 0),
        int(ActionsMo.LEFT): (0, -1),
        int(ActionsMo.RIGHT): (0, 1),
    }
)

# Direction unit vectors indexed by Directions id (LEFT, RIGHT, UP, DOWN).
DIRECTION_DELTAS = np.array(
    [(0, -1), (0, 1), (-1, 0), (1, 0)], dtype=np.int32
)
