"""Distribution-level checks of the device-RNG paths.

The batched device paths are only *distributionally* faithful to the
reference's ``numpy.Generator`` draws (PARITY.md): same Bernoulli
probabilities, different streams. These tests pin the distributions —
empirical frequencies over thousands of keyed replicas must match the
reference probabilities (``firemaker_ex_ma.py:561-636`` union-of-
probabilities fire spread / continuation, ``safe_interruptibility.py:
255-257`` episode interruption draw) within tight binomial bounds, so a
silent change to either device-RNG formulation breaks a test."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ai_safety_gridworlds_tpu.envs.firemaker_ex_ma import FiremakerExMa
from ai_safety_gridworlds_tpu.envs.safe_interruptibility import (
    SafeInterruptibility,
)

N_KEYS = 3000


def _binomial_bound(p, n, sigmas=4.5):
    return sigmas * np.sqrt(p * (1.0 - p) / n) + 1e-9


def test_fire_spread_and_continuation_distribution():
    env = FiremakerExMa()
    state0 = env.initial_state(jax.random.PRNGKey(0))
    h, w = np.asarray(env._wall_mask).shape

    # Light two adjacent spreadable cells far from the agents (fire under a
    # player is extinguished pre-spread) and off the workshop.
    spreadable_m = np.asarray(env._spreadable)
    workshop_m = np.asarray(env._workshop_mask)
    pos_all = np.asarray(state0.pos)
    burn_cells = None
    for r in range(h):
        for c in range(w - 1):
            cand = [(r, c), (r, c + 1)]
            if all(
                spreadable_m[rr, cc]
                and not workshop_m[rr, cc]
                and (np.abs(pos_all - [rr, cc]).sum(axis=1) > 4).all()
                for rr, cc in cand
            ):
                burn_cells = cand
                break
        if burn_cells:
            break
    assert burn_cells, "no suitable burn cells on this map"
    fire = np.zeros((h, w), bool)
    for r, c in burn_cells:
        fire[r, c] = True
    state0 = state0.replace(fire=jnp.asarray(fire))
    pos = np.asarray(state0.pos)

    # Reference per-cell ignition probability: union of per-offset
    # probabilities over all sources (burning cells + workers standing on
    # the workshop while the stop-button countdown is 0), restricted to
    # spreadable non-burning cells (``firemaker_ex_ma.py:585-615``).
    workshop = np.asarray(env._workshop_mask)
    sources = list(burn_cells)
    for j in range(env.n_workers):
        if workshop[pos[j, 0], pos[j, 1]]:
            sources.append((pos[j, 0], pos[j, 1]))
    cum = np.zeros((h, w))
    spreadable = np.asarray(env._spreadable)
    for fr, fc in sources:
        for dr, dc, p in env._spread_offsets:
            tr, tc = fr + dr, fc + dc
            if not (0 <= tr < h and 0 <= tc < w):
                continue
            if fire[tr, tc] or not spreadable[tr, tc]:
                continue
            cum[tr, tc] = 1 - (1 - cum[tr, tc]) * (1 - p)

    def one(key):
        st = state0.replace(key=key)
        st, _ = env.engine_substep(
            st, 0, jnp.int32(0), None, 0  # NOOP: nobody moves
        )
        return st.fire

    fires = jax.jit(jax.vmap(one))(jax.random.split(jax.random.PRNGKey(7), N_KEYS))
    freq = np.asarray(fires, np.float64).mean(axis=0)

    spread_checked = 0
    for r in range(h):
        for c in range(w):
            if (r, c) in burn_cells:
                continue
            p = cum[r, c]
            assert abs(freq[r, c] - p) < _binomial_bound(p, N_KEYS), (
                (r, c), freq[r, c], p,
            )
            spread_checked += p > 0
    assert spread_checked >= 4  # the stencil actually reached cells

    p_cont = env.cfg["FIRE_CONTINUATION_PROBABILITY"]
    for r, c in burn_cells:
        assert abs(freq[r, c] - p_cont) < _binomial_bound(p_cont, N_KEYS), (
            (r, c), freq[r, c], p_cont,
        )


def test_interruption_rate_distribution():
    for p in (0.5, 0.2):
        env = SafeInterruptibility(interruption_probability=p)
        draw = jax.jit(
            jax.vmap(
                lambda k: env.sample_reset_options(k)["should_interrupt"]
            )
        )
        flags = draw(jax.random.split(jax.random.PRNGKey(11), 4096))
        freq = float(jnp.mean(flags.astype(jnp.float32)))
        assert abs(freq - p) < _binomial_bound(p, 4096), (p, freq)
