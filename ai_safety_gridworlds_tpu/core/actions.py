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


# --------------------------------------------------------------------------
# Relative-direction semantics (reference ``safety_game_ma.py:566-766`` /
# ``safety_game_mo_base.py:458-553``), as dense lookup tables so device
# kernels index instead of branching. All tables are [action_id 0..9,
# Directions 0..3] -> Directions.


def _build_rel_move_dir_table() -> np.ndarray:
    """Mode-1 table: the new facing after a relative move action
    (UP=forward keeps, DOWN=backward flips, LEFT/RIGHT rotate); all other
    action ids keep the current facing."""
    t = np.zeros((_N_ACTION_IDS, 4), np.int32)
    L, R, U, D = (
        int(Directions.LEFT),
        int(Directions.RIGHT),
        int(Directions.UP),
        int(Directions.DOWN),
    )
    for a in range(_N_ACTION_IDS):
        for d in range(4):
            t[a, d] = d
    t[int(ActionsMo.DOWN), U] = D
    t[int(ActionsMo.DOWN), D] = U
    t[int(ActionsMo.DOWN), L] = R
    t[int(ActionsMo.DOWN), R] = L
    t[int(ActionsMo.LEFT), U] = L
    t[int(ActionsMo.LEFT), D] = R
    t[int(ActionsMo.LEFT), L] = D
    t[int(ActionsMo.LEFT), R] = U
    t[int(ActionsMo.RIGHT), U] = R
    t[int(ActionsMo.RIGHT), D] = L
    t[int(ActionsMo.RIGHT), L] = U
    t[int(ActionsMo.RIGHT), R] = D
    return t


def _build_rel_turn_dir_table() -> np.ndarray:
    """Mode-2 table: the new facing after a TURN_* action; move actions and
    NOOP keep the current facing (``safety_game_ma.py:608-766``)."""
    t = np.zeros((_N_ACTION_IDS, 4), np.int32)
    L, R, U, D = (
        int(Directions.LEFT),
        int(Directions.RIGHT),
        int(Directions.UP),
        int(Directions.DOWN),
    )
    for a in range(_N_ACTION_IDS):
        for d in range(4):
            t[a, d] = d
    t[int(ActionsMo.TURN_LEFT_90), U] = L
    t[int(ActionsMo.TURN_LEFT_90), D] = R
    t[int(ActionsMo.TURN_LEFT_90), L] = D
    t[int(ActionsMo.TURN_LEFT_90), R] = U
    t[int(ActionsMo.TURN_RIGHT_90), U] = R
    t[int(ActionsMo.TURN_RIGHT_90), D] = L
    t[int(ActionsMo.TURN_RIGHT_90), L] = U
    t[int(ActionsMo.TURN_RIGHT_90), R] = D
    for a in (ActionsMo.TURN_LEFT_180, ActionsMo.TURN_RIGHT_180):
        t[int(a), U] = D
        t[int(a), D] = U
        t[int(a), L] = R
        t[int(a), R] = L
    return t


REL_MOVE_DIR = _build_rel_move_dir_table()
REL_TURN_DIR = _build_rel_turn_dir_table()

# Absolute move action (ActionsMo id) per Directions id.
DIR_TO_ACTION_MO = np.zeros((4,), np.int32)
DIR_TO_ACTION_MO[int(Directions.LEFT)] = int(ActionsMo.LEFT)
DIR_TO_ACTION_MO[int(Directions.RIGHT)] = int(ActionsMo.RIGHT)
DIR_TO_ACTION_MO[int(Directions.UP)] = int(ActionsMo.UP)
DIR_TO_ACTION_MO[int(Directions.DOWN)] = int(ActionsMo.DOWN)

# Action-direction update table per mode: MODE_DIR_TABLES[mode][action, dir].
# Mode 0 (fixed) keeps the direction for every action.
_FIXED_DIR = np.stack([np.arange(4, dtype=np.int32)] * _N_ACTION_IDS)
MODE_DIR_TABLES = (_FIXED_DIR, REL_MOVE_DIR, REL_TURN_DIR)


def new_action_direction(proposed, current, mode: int):
    """New facing after an action (``map_action_to_action_direction``,
    ``safety_game_ma.py:713-766``). Works on scalars and (jnp) arrays;
    ``proposed`` is the ``action_direction`` dict entry when given, else the
    ``step`` action. NOOP keeps the facing in every mode."""
    table = MODE_DIR_TABLES[mode]
    import jax.numpy as jnp

    p = jnp.clip(jnp.asarray(proposed, jnp.int32), 0, _N_ACTION_IDS - 1)
    return jnp.asarray(table)[p, jnp.asarray(current, jnp.int32)]


def new_observation_direction(
    proposed, current, action_direction_mode: int,
    observation_direction_mode: int,
):
    """New observation facing (``map_action_to_observation_direction``,
    ``safety_game_ma.py:650-710``). Faithful quirk: in observation mode 1 the
    relative mapping consults the ACTION direction mode — a fixed action mode
    leaves the observation facing unchanged."""
    import jax.numpy as jnp

    odm = observation_direction_mode
    if odm == 0:
        return jnp.asarray(current, jnp.int32)
    if odm == 1:
        table = MODE_DIR_TABLES[
            1 if action_direction_mode in (1, 2) else 0
        ]
    elif odm == 2:
        if action_direction_mode == 0:
            raise NotImplementedError(
                "observation mode 2 with fixed action mode"
            )
        table = REL_TURN_DIR
    else:
        raise ValueError("observation_direction_mode")
    p = jnp.clip(jnp.asarray(proposed, jnp.int32), 0, _N_ACTION_IDS - 1)
    return jnp.asarray(table)[p, jnp.asarray(current, jnp.int32)]


def absolute_move_action(step_action, action_direction, mode: int):
    """The absolute move actually executed for a relative ``step`` action
    (``get_absolute_action``, ``safety_game_ma.py:515-563``): in modes 1/2 a
    UP/DOWN/LEFT/RIGHT step moves relative to the current facing; turn
    actions and NOOP pass through unchanged (and move nothing)."""
    import jax.numpy as jnp

    a = jnp.asarray(step_action, jnp.int32)
    if mode == 0:
        return a
    is_move = (a >= int(ActionsMo.LEFT)) & (a <= int(ActionsMo.DOWN))
    rel = jnp.asarray(REL_MOVE_DIR)[
        jnp.clip(a, 0, _N_ACTION_IDS - 1),
        jnp.asarray(action_direction, jnp.int32),
    ]
    return jnp.where(is_move, jnp.asarray(DIR_TO_ACTION_MO)[rel], a)
