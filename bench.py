"""Throughput benchmark: batched env steps/s on the default JAX backend.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The benchmark steps BATCH auto-resetting boat_race environments in lockstep
for N_STEPS scan iterations with a uniform-random policy, including the
value-mapped board observation each step (the same per-step work surface the
reference exposes through ``SafetyEnvironment.step`` + distiller).

Baseline: the reference (pure-Python pycolab) runs the same env at
~6.7k steps/s single-stream on this machine's CPU (no published numbers
exist upstream — BASELINE.md). vs_baseline = aggregate steps/s ÷ that.
"""

import functools
import json
import time

import jax
import jax.numpy as jnp

from ai_safety_gridworlds_tpu.core import base as core_base
from ai_safety_gridworlds_tpu.envs.boat_race import BoatRace

# Measured on this machine: reference BoatRaceEnvironment.step loop
# (pycolab engine + distiller), single stream, CPU.
REFERENCE_STEPS_PER_SEC = 6.7e3

BATCH = 4096
# Long scan per dispatch: the per-call host->device dispatch overhead
# dominates short chunks (512-step chunks measure ~4B steps/s where
# 4096-step chunks measure ~22B steps/s on the same chip).
N_STEPS = 4096


def main():
    env = BoatRace()
    step_fn = jax.vmap(functools.partial(core_base.episode_step, env))
    obs_fn = jax.vmap(lambda s: env.observe(s)["board"])

    def rollout_chunk(ep, key):
        def body(carry, step_key):
            eps, acc = carry
            actions = jax.random.randint(
                step_key, (BATCH,), env.action_min, env.action_max + 1,
                dtype=jnp.int32,
            )
            eps, outs = step_fn(eps, actions)
            # Render the observation every step (part of the reference's
            # per-step work); fold into an accumulator so nothing is DCE'd.
            obs = obs_fn(eps.env_state)
            # Full-observation reduction: forces the whole board render to be
            # materialized every step (a corner element alone would let XLA
            # fold the render away).
            acc = acc + jnp.sum(outs.step.reward) + jnp.sum(obs)
            return (eps, acc), None

        (ep, acc), _ = jax.lax.scan(
            body, (ep, jnp.float32(0.0)), jax.random.split(key, N_STEPS)
        )
        return ep, acc

    keys = jax.random.split(jax.random.PRNGKey(0), BATCH)
    ep0 = jax.jit(jax.vmap(functools.partial(core_base.episode_reset, env)))(
        keys
    )
    run = jax.jit(rollout_chunk)

    # Warm-up / compile.
    ep, acc = run(ep0, jax.random.PRNGKey(1))
    jax.block_until_ready(acc)

    # Timed runs.
    n_rep = 3
    t0 = time.perf_counter()
    for i in range(n_rep):
        ep, acc = run(ep, jax.random.PRNGKey(2 + i))
    jax.block_until_ready(acc)
    dt = time.perf_counter() - t0

    steps = n_rep * N_STEPS * BATCH
    sps = steps / dt
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec_boat_race_b4096",
                "value": round(sps, 1),
                "unit": "steps/s",
                "vs_baseline": round(sps / REFERENCE_STEPS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
