"""Pallas kernel parity tests (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from ai_safety_gridworlds_tpu.ops.pallas_ops import (
    compact_lut,
    fire_union_probability,
    fire_union_reference,
    value_map_batched,
    value_map_reference,
)


def _spread_probs():
    p = np.zeros((5, 5), np.float32)
    for dy in range(5):
        for dx in range(5):
            d = np.hypot(dy - 2, dx - 2)
            if 0 < d < 3:
                p[dy, dx] = (1 - (d - 1) / (3 - 1 + 1e-9)) * 0.01
    return p


def test_value_map_matches_reference():
    rng = np.random.RandomState(0)
    lut = np.zeros(256, np.float32)
    for i, c in enumerate(" #ADFGW12"):
        lut[ord(c)] = float(i)
    boards = rng.choice(
        [ord(c) for c in " #ADFGW12"], size=(7, 13, 13)
    ).astype(np.uint8)
    codes, values = compact_lut(lut)
    ref = np.asarray(value_map_reference(jnp.asarray(boards), codes, values))
    out = np.asarray(value_map_batched(jnp.asarray(boards), lut))
    assert np.array_equal(ref, out)


def test_value_map_odd_batch_and_shape():
    rng = np.random.RandomState(1)
    lut = np.zeros(256, np.float32)
    lut[ord("#")] = 5.0
    lut[ord("A")] = 2.0
    boards = rng.choice(
        [ord(" "), ord("#"), ord("A")], size=(5, 3, 29)
    ).astype(np.uint8)
    codes, values = compact_lut(lut)
    ref = np.asarray(value_map_reference(jnp.asarray(boards), codes, values))
    out = np.asarray(value_map_batched(jnp.asarray(boards), lut))
    assert np.array_equal(ref, out)


def test_value_map_multi_tile_grids():
    """Batches beyond one 256-row tile, including a non-multiple tail
    (the regression where grid floor-division dropped rows past the last
    full tile and returned uninitialized memory)."""
    rng = np.random.RandomState(2)
    lut = np.zeros(256, np.float32)
    for i, c in enumerate(" #AG"):
        lut[ord(c)] = float(i)
    codes, values = compact_lut(lut)
    for batch in (300, 600):
        boards = rng.choice(
            [ord(c) for c in " #AG"], size=(batch, 7, 9)
        ).astype(np.uint8)
        ref = np.asarray(
            value_map_reference(jnp.asarray(boards), codes, values)
        )
        out = np.asarray(value_map_batched(jnp.asarray(boards), lut))
        assert np.isfinite(out).all()
        assert np.array_equal(ref, out)


def test_fire_union_matches_reference():
    rng = np.random.RandomState(0)
    fire = rng.rand(8, 17, 17) < 0.2
    p = _spread_probs()
    ref = np.asarray(fire_union_reference(jnp.asarray(fire), p))
    out = np.asarray(fire_union_probability(jnp.asarray(fire), p))
    np.testing.assert_array_equal(ref, out)


def test_fire_union_empty_and_full():
    p = _spread_probs()
    empty = np.zeros((2, 17, 17), bool)
    out = np.asarray(fire_union_probability(jnp.asarray(empty), p))
    assert np.all(out == 0.0)
    full = np.ones((2, 17, 17), bool)
    out = np.asarray(fire_union_probability(jnp.asarray(full), p))
    ref = np.asarray(fire_union_reference(jnp.asarray(full), p))
    np.testing.assert_array_equal(ref, out)
