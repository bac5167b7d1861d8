"""Shared scaffolding for the fused multi-agent step kernels.

The three fused kernels (:mod:`.fused_firemaker`, :mod:`.fused_savanna`,
:mod:`.fused_island_ma`) share everything except their step bodies: the
packed [rows, B] layout, the action-draw + Fisher-Yates agent-order
prologue, the finalize epilogue (``MaSafetyGridworld.finalize_step``
semantics), and the XLA-scan / pallas-grid rollout drivers. This module
holds that machinery once so a fix in one place reaches all kernels.

Subclasses implement ``_step(S, statics, consts, collect_draws)`` plus
``init_packed`` (which must set ``self._kstatics_np``, the dict of static
board inputs — possibly empty — and call ``_invalidate_device_cache``),
and declare ``STATE_FIELDS`` and ``DEFAULT_TILE``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ai_safety_gridworlds_tpu.core.timestep import StepType
from ai_safety_gridworlds_tpu.ops import prng

_I32 = jnp.int32

FIRST = int(StepType.FIRST)
MID = int(StepType.MID)
LAST = int(StepType.LAST)
DEAD = int(StepType.DEAD)


def min_water_dist(water_b: np.ndarray, h: int, w: int) -> np.ndarray:
    """Per-lane min-Manhattan distance to water, clamped to 99.

    ``water_b`` is bool [HW, B]; returns int32 [HW, B]. Matches the
    device kernels' historical ``where(d > 98, 99, d)`` clamp and the
    per-env ``_water_dist`` tables. Works per lane over the (few) water
    cells, so memory stays O(HW^2 + HW*B) even for resized maps.
    """
    HW, B = water_b.shape
    cells = np.arange(HW, dtype=np.int32)
    rr, cc = cells // w, cells % w
    d2 = (
        np.abs(rr[:, None] - rr[None, :])
        + np.abs(cc[:, None] - cc[None, :])
    ).astype(np.int32)
    dist = np.full((HW, B), 99, np.int32)
    for b in range(B):
        idx = np.nonzero(water_b[:, b])[0]
        if idx.size:
            dist[:, b] = np.minimum(d2[:, idx].min(axis=1), 99)
    return dist


class FusedMaBase:
    """Packed batched MA env with a single-kernel step/rollout."""

    STATE_FIELDS: tuple = ()
    DEFAULT_TILE: int = 256

    # Subclasses fill these in __init__/init_packed.
    consts: dict
    _kstatics_np: dict

    # ------------------------------------------------------------ prologue

    def _draw_actions_and_order(self, S, over, reasons, ctr0, iota_n):
        """Uniform per-agent action draws (site 0) + Fisher-Yates agent
        order (site 1). Reset lanes and dead agents draw -1 (excluded from
        the reference actions dict, ``pycolab_interface_ma.py:183``)."""
        key_hi, key_lo = S["key"][0:1], S["key"][1:2]
        n = iota_n.shape[0]
        u_act = prng.uniform(key_hi, key_lo, ctr0, iota_n)
        from ai_safety_gridworlds_tpu.core.timestep import TerminationReason

        none_r = int(TerminationReason.NONE)
        actions = self.amin + jnp.floor(
            u_act * (self.amax - self.amin + 1)
        ).astype(_I32)
        actions = jnp.clip(actions, self.amin, self.amax)
        actions = jnp.where(over | (reasons != none_r), -1, actions)

        order = jnp.tile(iota_n, (1, actions.shape[1]))
        if self.env.randomize_agent_actions_order and n > 1:
            u_perm = prng.uniform(key_hi, key_lo, ctr0 + np.uint32(1), iota_n)
            for k in range(n - 1, 0, -1):
                jidx = jnp.clip(
                    jnp.floor(u_perm[k : k + 1] * (k + 1)).astype(_I32), 0, k
                )
                vk = order[k : k + 1]
                vj = jnp.sum(
                    jnp.where(iota_n == jidx, order, 0), axis=0, keepdims=True
                )
                order = jnp.where(iota_n == jidx, vk, order)
                order = jnp.where(iota_n == k, vj, order)
        return actions, order

    # ------------------------------------------------------------ epilogue

    def _finalize_types(self, t, reasons, types, over):
        """Per-agent step-type transitions + episode-done flag
        (``MaSafetyGridworld.finalize_step``)."""
        from ai_safety_gridworlds_tpu.core.timestep import TerminationReason

        none_r = int(TerminationReason.NONE)
        truncated = t >= self.max_iterations
        game_over_pa = truncated | (reasons != none_r)
        new_types = jnp.where(
            game_over_pa,
            jnp.where((types == MID) | (types == FIRST), LAST, DEAD),
            MID,
        )
        out_types = jnp.where(over, FIRST, new_types)
        done = jnp.all(game_over_pa, axis=0, keepdims=True) & ~over
        return out_types, done

    # ------------------------------------------------------------ backends

    @staticmethod
    def _to_device(np_dict):
        """numpy dict -> device dict, memo-safe: inside a trace
        ``jnp.asarray`` yields tracers, which must never be cached."""
        out = {k: jnp.asarray(v) for k, v in np_dict.items()}
        cacheable = not any(
            isinstance(v, jax.core.Tracer) for v in out.values()
        )
        return out, cacheable

    def _consts_jnp(self):
        cache = getattr(self, "_consts_dev", None)
        if cache is None:
            cache, ok = self._to_device(self.consts)
            if ok:
                self._consts_dev = cache
        return cache

    def _statics_jnp(self):
        cache = getattr(self, "_statics_dev", None)
        if cache is None:
            cache, ok = self._to_device(self._kstatics_np)
            if ok:
                self._statics_dev = cache
        return cache

    def _invalidate_device_cache(self):
        self._statics_dev = None

    @functools.partial(jax.jit, static_argnames=("self", "n_steps"))
    def _rollout_xla(self, S, statics, n_steps):
        consts = self._consts_jnp()

        def body(S, _):
            return self._step(S, statics, consts), None

        S, _ = jax.lax.scan(body, S, None, length=n_steps)
        return S

    def _rollout_pallas_call(self, S, statics, n_steps, tile, interpret):
        B = S["t"].shape[1]
        assert B % tile == 0, "batch must be a multiple of the lane tile"
        grid = B // tile
        const_names = sorted(self.consts)
        static_names = sorted(self._kstatics_np)
        state_names = list(self.STATE_FIELDS)

        def kernel(*refs):
            nc, ns = len(const_names), len(static_names)
            consts = {k: r[:] for k, r in zip(const_names, refs[:nc])}
            statics_k = {
                k: r[:] for k, r in zip(static_names, refs[nc : nc + ns])
            }
            in_refs = refs[nc + ns : nc + ns + len(state_names)]
            out_refs = refs[nc + ns + len(state_names) :]
            Sk = {k: r[:] for k, r in zip(state_names, in_refs)}

            def body(_, Sk):
                return self._step(Sk, statics_k, consts)

            Sk = jax.lax.fori_loop(0, n_steps, body, Sk)
            for k, r in zip(state_names, out_refs):
                r[:] = Sk[k]

        def block(arr, batched):
            d0 = arr.shape[0]
            if not batched:
                return pl.BlockSpec(
                    (d0, arr.shape[1]), lambda g: (0, 0),
                    memory_space=pltpu.VMEM,
                )
            return pl.BlockSpec(
                (d0, tile), lambda g: (0, g), memory_space=pltpu.VMEM
            )

        const_vals = [jnp.asarray(self.consts[k]) for k in const_names]
        static_vals = [statics[k] for k in static_names]
        static_batched = [v.shape[1] != 1 for v in static_vals]
        state_vals = [S[k] for k in state_names]
        out_shapes = [
            jax.ShapeDtypeStruct(v.shape, v.dtype) for v in state_vals
        ]
        outs = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[block(v, False) for v in const_vals]
            + [block(v, b) for v, b in zip(static_vals, static_batched)]
            + [block(v, True) for v in state_vals],
            out_specs=[block(v, True) for v in state_vals],
            out_shape=out_shapes,
            interpret=interpret,
        )(*const_vals, *static_vals, *state_vals)
        return dict(zip(state_names, outs))

    def rollout(self, S, n_steps, backend="pallas", tile=None,
                interpret=None):
        """Advance the packed batch ``n_steps`` full MA steps.

        Returns the updated packed state; cumulative reward sums and
        episode counts accumulate in ``stats_rewards``/``stats_episodes``.
        The lane tile defaults to the kernel's measured optimum and is
        clamped to the batch size (which must remain a multiple of it).
        """
        if tile is None:
            tile = self.DEFAULT_TILE
        if backend == "xla":
            return self._rollout_xla(S, self._statics_jnp(), n_steps)
        tile = min(tile, S["t"].shape[1])
        if interpret is None:
            # The axon remote-TPU plugin reports platform "axon", not
            # "tpu" — only a true CPU backend falls back to the
            # interpreter.
            interpret = jax.devices()[0].platform == "cpu"
        # Cache the jitted entry per configuration: a fresh jit wrapper
        # per call would retrace and recompile every rollout.
        cache_key = (n_steps, tile, interpret)
        if not hasattr(self, "_pallas_cache"):
            self._pallas_cache = {}
        fn = self._pallas_cache.get(cache_key)
        if fn is None:
            fn = jax.jit(
                functools.partial(
                    self._rollout_pallas_call,
                    n_steps=n_steps,
                    tile=tile,
                    interpret=interpret,
                )
            )
            self._pallas_cache[cache_key] = fn
        return fn(S, self._statics_jnp())

    # ------------------------------------------------------------ interop

    def step_xla(self, S, collect_draws=False):
        """One un-jitted packed step (for tests)."""
        return self._step(
            S, self._statics_jnp(), self._consts_jnp(), collect_draws
        )
