"""Map randomization: tile counts, resizing, interior shuffling.

Host-side (episode-boundary) re-implementation of the reference machinery in
``safety_game_mo_base.make_safety_game`` (``safety_game_mo_base.py:918-1134``):

* optional board resize to ``map_height x map_width`` with edge preservation
  (interior regenerated from ``tile_type_counts`` and shuffled);
* ``tile_type_counts`` enforcement — excess tiles of a type are removed at
  Generator-chosen locations;
* interior shuffle of the whole map via ``Generator.shuffle``;
* caching keyed by environment identity + seed/layout/episode under the
  randomization frequency (1 = once per experiment, 2 = per layout seed,
  3 = per episode).

All draws consume the env ``numpy.random.Generator`` in the same order as
the reference. A device-side variant (``shuffle_interior_device``) provides
the batched JAX path (same distribution, JAX PRNG).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# Cache mirroring ``randomized_maps_per_environment``
# (``safety_game_mo_base.py:916``).
randomized_maps_per_environment: dict = {}


def clear_randomization_cache():
    randomized_maps_per_environment.clear()


def randomize_map(
    board: np.ndarray,
    np_random,
    *,
    what_lies_beneath: str = " ",
    what_lies_outside: str = " ",
    tile_type_counts: Optional[dict] = None,
    map_randomization_frequency: int = 0,
    preserve_map_edges: bool = True,
    map_width: Optional[int] = None,
    map_height: Optional[int] = None,
    cache_key: Optional[str] = None,
) -> np.ndarray:
    """Return the randomized uint8 board for a new episode."""
    board = board.copy()

    if not tile_type_counts or map_randomization_frequency < 1:
        return board

    if cache_key is not None and cache_key in randomized_maps_per_environment:
        return randomized_maps_per_environment[cache_key].copy()

    resize = (map_height is not None or map_width is not None) and (
        map_height != board.shape[0] or map_width != board.shape[1]
    )
    if resize:
        if map_height is None:
            map_height = board.shape[0]
        if map_width is None:
            map_width = board.shape[1]
        if preserve_map_edges:
            shape = (map_height - 2, map_width - 2)
        else:
            shape = (map_height, map_width)
        submap = np.full(
            shape[0] * shape[1], ord(what_lies_beneath), np.uint8
        )
        next_i = 0
        for tile_type, count in tile_type_counts.items():
            submap[next_i : next_i + count] = ord(tile_type)
            next_i += count
        np_random.shuffle(submap)
        submap = submap.reshape(shape)
        if preserve_map_edges:
            out = np.full(
                (map_height, map_width), ord(what_lies_outside), np.uint8
            )
            out[1:-1, 1:-1] = submap
            board = out
        else:
            board = submap
    else:
        # Remove excess tiles per type (``safety_game_mo_base.py:1053-1076``).
        for tile_type, max_count in tile_type_counts.items():
            locations = np.argwhere(board == ord(tile_type))
            n_remove = max(0, len(locations) - max_count)
            if n_remove > 0:
                idx = np_random.choice(
                    len(locations), size=n_remove, replace=False
                )
                rm = locations[idx]
                board[rm[:, 0], rm[:, 1]] = ord(what_lies_beneath)
        # Interior shuffle (``safety_game_mo_base.py:1094-1113``).
        if preserve_map_edges:
            submap = board[1:-1, 1:-1]
        else:
            submap = board
        shape = submap.shape
        flat = submap.reshape(shape[0] * shape[1])
        np_random.shuffle(flat)
        submap = flat.reshape(shape)
        if preserve_map_edges:
            board[1:-1, 1:-1] = submap
        else:
            board = submap

    if cache_key is not None:
        randomized_maps_per_environment[cache_key] = board.copy()
    return board


def randomization_cache_key(
    env_class: str,
    seed,
    env_layout_seed,
    episode_no,
    tile_type_counts: dict,
    ascii_art,
    map_width,
    map_height,
    frequency: int,
) -> Optional[str]:
    """Build the cache key matching ``safety_game_mo_base.py:958-975``."""
    counts_key = sorted(tile_type_counts.items())
    art_key = "\n".join(ascii_art)
    if frequency == 1:
        return f"{env_class}|{seed}|{counts_key}|{art_key}|{map_width}|{map_height}"
    if frequency == 2:
        return (
            f"{env_class}|{seed}|{env_layout_seed}|{counts_key}|{art_key}"
            f"|{map_width}|{map_height}"
        )
    if frequency == 3:
        return (
            f"{env_class}|{seed}|{env_layout_seed}|{episode_no}|{counts_key}"
            f"|{art_key}|{map_width}|{map_height}"
        )
    raise ValueError("map_randomization_frequency")


def shuffle_interior_device(board: jnp.ndarray, key) -> jnp.ndarray:
    """Device-side interior shuffle for batched rollouts (JAX PRNG)."""
    interior = board[1:-1, 1:-1]
    h, w = interior.shape
    flat = interior.reshape(-1)
    perm = jax.random.permutation(key, flat.shape[0])
    flat = flat[perm]
    return board.at[1:-1, 1:-1].set(flat.reshape(h, w))
