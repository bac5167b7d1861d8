"""Distributional sanity of the counter-based PRF used by fused kernels."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats as _scipy_stats  # noqa: F401  (absent: skip below)

from ai_safety_gridworlds_tpu.ops import prng


def _uniforms(n, key_hi=0x1234, key_lo=0x5678, site=0):
    idx = jnp.arange(n, dtype=jnp.uint32).reshape(n, 1)
    u = prng.uniform(
        jnp.uint32(key_hi), jnp.uint32(key_lo), jnp.uint32(site), idx
    )
    return np.asarray(u).ravel()


def test_uniform_range_and_moments():
    u = _uniforms(1 << 16)
    assert (u >= 0).all() and (u < 1).all()
    assert abs(u.mean() - 0.5) < 0.01
    assert abs(u.var() - 1.0 / 12.0) < 0.01


def test_chi_square_uniformity():
    u = _uniforms(1 << 16, site=3)
    counts, _ = np.histogram(u, bins=64, range=(0, 1))
    expected = len(u) / 64
    chi2 = ((counts - expected) ** 2 / expected).sum()
    # 63 dof: 99.9th percentile ~ 103.4
    assert chi2 < 103.4, chi2


def test_site_and_key_decorrelation():
    a = _uniforms(1 << 14, site=0)
    b = _uniforms(1 << 14, site=1)
    c = _uniforms(1 << 14, key_lo=0x5679, site=0)
    assert abs(np.corrcoef(a, b)[0, 1]) < 0.03
    assert abs(np.corrcoef(a, c)[0, 1]) < 0.03
    assert not np.array_equal(a, b)


def test_counter_stream_no_repeats():
    """Sequential counters at a fixed index give distinct words."""
    ctr = jnp.arange(4096, dtype=jnp.uint32).reshape(-1, 1)
    bits = prng.hash_u32(
        jnp.uint32(7), jnp.uint32(11), ctr, jnp.uint32(0)
    )
    vals = np.asarray(bits).ravel()
    assert len(np.unique(vals)) == len(vals)


def test_fire_spread_rate_matches_probability():
    """End-to-end: fused firemaker's continuation draws keep fire burning
    at FIRE_CONTINUATION_PROBABILITY (chi-square on the device RNG path,
    cf. VERDICT 'distributionally faithful' requirement)."""
    from ai_safety_gridworlds_tpu.envs.firemaker_ex_ma import FiremakerExMa
    from ai_safety_gridworlds_tpu.ops.fused_firemaker import FusedFiremaker

    env = FiremakerExMa(FIRE_CONTINUATION_PROBABILITY=0.8)
    fused = FusedFiremaker(env)
    B = 128
    S = fused.init_packed(seed=2, batch=B)
    # Plant fire away from agents and track survival one step at a time.
    fire = np.zeros((fused.HW, B), np.float32)
    cells = [2 * fused.w + c for c in range(2, 15)]
    survived = 0
    total = 0
    step = jax.jit(lambda s: fused._step(s, {}, fused._consts_jnp()))
    for rep in range(30):
        for c in cells:
            fire[c] = 1.0
        S["fire"] = jnp.asarray(fire)
        S = step(S)
        after = np.asarray(S["fire"])
        for c in cells:
            # Count survivals per sub-step: fire that survived all
            # n sub-steps of the full MA step.
            total += B
            survived += int((after[c] > 0.5).sum())
    rate = survived / total
    # Survival over n sequential sub-steps ~ p^n (± spread re-ignition,
    # which is rare at default spread probability 0.01).
    expected = 0.8 ** fused.n
    assert abs(rate - expected) < 0.05, (rate, expected)
