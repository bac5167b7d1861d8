"""ASCII-art map compiler.

Replaces the reference's runtime ``ascii_art_to_game`` machinery
(``pycolab/ascii_art.py:32-366``) with a *compile-time* transformation: maps
are parsed once on the host into static numpy tables (uint8 boards, per-char
masks, 256-entry lookup tables) which the jitted step/render kernels consume
as constants. Nothing here ever runs under ``jax.jit``.
"""

from __future__ import annotations

from typing import Iterable, Mapping, Sequence

import numpy as np


def art_to_uint8(art: Sequence[str]) -> np.ndarray:
    """Convert a list of equal-length strings to a 2-D uint8 char-code array.

    Mirrors the semantics of ``pycolab/ascii_art.py:296``
    (``ascii_art_to_uint8_nparray``) without sharing any code: each character
    becomes its ASCII code.
    """
    rows = [np.frombuffer(line.encode("ascii"), dtype=np.uint8) for line in art]
    widths = {r.shape[0] for r in rows}
    if len(widths) != 1:
        raise ValueError("All rows of the ASCII art must have equal length.")
    return np.stack(rows)


def char_mask(board: np.ndarray, char: str) -> np.ndarray:
    """Boolean mask of cells equal to ``char``."""
    return board == np.uint8(ord(char))


def chars_mask(board: np.ndarray, chars: Iterable[str]) -> np.ndarray:
    """Boolean mask of cells whose char is in ``chars``."""
    mask = np.zeros(board.shape, dtype=bool)
    for c in chars:
        mask |= board == np.uint8(ord(c))
    return mask


def positions_of(board: np.ndarray, char: str) -> np.ndarray:
    """All (row, col) positions of ``char``, int32 [n, 2], row-major order."""
    rows, cols = np.nonzero(char_mask(board, char))
    return np.stack([rows, cols], axis=-1).astype(np.int32)


def position_of(board: np.ndarray, char: str) -> np.ndarray:
    """The unique (row, col) of ``char``; raises if not exactly one."""
    pos = positions_of(board, char)
    if pos.shape[0] != 1:
        raise ValueError(
            f"Expected exactly one {char!r} on the map, found {pos.shape[0]}."
        )
    return pos[0]


def replace_chars(
    board: np.ndarray, chars: Iterable[str], what_lies_beneath: str
) -> np.ndarray:
    """Return a copy of ``board`` where ``chars`` are replaced by the backdrop.

    This implements the "what lies beneath" convention of the reference map
    builder (``pycolab/ascii_art.py:278``): cells occupied by sprites/drapes at
    map definition time are backed by ``what_lies_beneath`` in the backdrop.
    """
    out = board.copy()
    out[chars_mask(board, chars)] = np.uint8(ord(what_lies_beneath))
    return out


def char_lut(
    mapping: Mapping[str, float], default: float = 0.0, dtype=np.float32
) -> np.ndarray:
    """Dense 256-entry lookup table from a char->scalar mapping.

    Used for observation value mappings (reference:
    ``observation_distiller.py:40-69``); the kernel indexes it with the uint8
    board, turning the reference's per-cell dict lookups into one gather.
    """
    lut = np.full((256,), default, dtype=dtype)
    for char, value in mapping.items():
        lut[ord(char)] = value
    return lut


def char_vector_lut(
    mapping: Mapping[str, Sequence[float]],
    width: int = 3,
    default: float = 0.0,
    dtype=np.float32,
) -> np.ndarray:
    """Dense [256, width] lookup table from a char->vector mapping (e.g. RGB)."""
    lut = np.full((256, width), default, dtype=dtype)
    for char, values in mapping.items():
        lut[ord(char)] = np.asarray(values, dtype=dtype)
    return lut


def char_set_lut(chars: Iterable[str]) -> np.ndarray:
    """Dense 256-entry bool table: True where the char code is in ``chars``.

    Used for impassable-character sets (reference:
    ``pycolab/prefab_parts/sprites.py:191``, ``_check_motion`` at 479): the
    movement kernel asks "is the char at the target cell impassable" with a
    single gather instead of a Python ``in`` test.
    """
    lut = np.zeros((256,), dtype=bool)
    for c in chars:
        lut[ord(c)] = True
    return lut


def rgb_lut_from_colours(
    colours: Mapping[str, tuple[int, int, int]]
) -> np.ndarray:
    """[256, 3] uint8 LUT from pycolab-style 0..999 colour triples.

    Reference scaling: ``(value / 999 * 255).astype(uint8)``
    (``observation_distiller.py:90``).
    """
    lut = np.zeros((256, 3), dtype=np.uint8)
    for char, rgb in colours.items():
        lut[ord(char)] = (np.asarray(rgb, dtype=np.float64) / 999.0 * 255.0).astype(
            np.uint8
        )
    return lut
