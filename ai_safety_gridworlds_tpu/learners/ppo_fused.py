"""PPO trained directly on the fused multi-agent kernels.

``learners/ppo.py`` collects rollouts on the generic vmapped per-env path
(~1M env-steps/s on the MA flagships). This module instead trains on the
fused single-kernel engines (``ops/fused_*``): the policy MLP runs INSIDE
the rollout kernel (``FusedMaBase._mlp_policy_actions``), the kernel
streams the per-step trajectory — policy features, sampled actions, logp,
value, per-agent scalarized rewards, per-agent dones — to time-chunked
VMEM output blocks (``FusedMaBase.rollout_collect``), and the PPO update
consumes it without the data ever taking the slow path. One ``train_step``
is one jitted program: a pallas collection kernel followed by the XLA
GAE/minibatch passes.

Each agent lane is an independent trajectory stream for the learner
(shared policy parameters — the standard parameter-sharing MARL setup), so
a batch of B environments with n agents trains on n*B streams. Reset
emissions and dead-agent steps carry ``action == -1`` and are masked out
of the loss exactly like the generic learner's FIRST mask.

The reference ships no learner at all (SURVEY §2.7/§5); this is new
TPU-first surface. Trajectory-vs-per-env-chain equivalence is pinned by
``tests/test_fused_ppo.py``.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct


class FusedPPOConfig(NamedTuple):
    """Static hyperparameters (jit constants)."""

    n_steps: int = 16          # rollout length per update
    n_epochs: int = 4          # passes over the rollout per update
    n_minibatches: int = 4     # minibatches per pass
    discount: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    value_coef: float = 0.5
    entropy_coef: float = 0.01
    lr: float = 3e-4
    max_grad_norm: float = 0.5
    hidden: int = 64


@struct.dataclass
class FusedPPOState:
    """Everything a run needs to continue — one checkpointable pytree."""

    params: Any          # dict: mlp_w1/mlp_b1/mlp_w2/mlp_b2
    opt_state: Any
    S: Any               # packed fused env state (dict of [rows, B])
    key: jnp.ndarray
    update_idx: jnp.ndarray  # int32 []


def _optimizer(config: FusedPPOConfig):
    return optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        optax.adam(config.lr),
    )


def init_params(key, n_features: int, n_actions: int, hidden: int = 64):
    """MLP params in the fused kernel's layout: ``mlp_w2``'s extra output
    row is the value head (``FusedMaBase._mlp_forward_agent``)."""
    k1, k2, k3 = jax.random.split(key, 3)
    s1 = 1.0 / np.sqrt(n_features)
    w2 = jnp.concatenate(
        [
            # Small policy logits at init (near-uniform exploration)...
            jax.random.normal(k2, (n_actions, hidden), jnp.float32) * 0.01,
            # ...regular scale for the value row.
            jax.random.normal(k3, (1, hidden), jnp.float32)
            / np.sqrt(hidden),
        ],
        axis=0,
    )
    return {
        "mlp_w1": jax.random.normal(k1, (hidden, n_features), jnp.float32)
        * s1,
        "mlp_b1": jnp.zeros((hidden, 1), jnp.float32),
        "mlp_w2": w2,
        "mlp_b2": jnp.zeros((n_actions + 1, 1), jnp.float32),
    }


def forward(params, obs):
    """Learner-side MLP head: obs [M, F] -> (logits [M, A], value [M]).

    Same parameters as the in-kernel forward, batch-major layout (the
    minibatch passes re-evaluate the policy every epoch)."""
    h = jax.nn.relu(
        jnp.dot(obs, params["mlp_w1"].T, preferred_element_type=jnp.float32)
        + params["mlp_b1"][:, 0]
    )
    out = (
        jnp.dot(h, params["mlp_w2"].T, preferred_element_type=jnp.float32)
        + params["mlp_b2"][:, 0]
    )
    return out[:, :-1], out[:, -1]


def init_train_state(
    fused, key, batch_size: int, seed: int = 0,
    config: FusedPPOConfig = FusedPPOConfig(),
) -> FusedPPOState:
    n_actions = fused.amax - fused.amin + 1
    params = init_params(
        key, fused.POLICY_FEATURES, n_actions, hidden=config.hidden
    )
    S = fused.init_packed(seed=seed, batch=batch_size)
    return FusedPPOState(
        params=params,
        opt_state=_optimizer(config).init(params),
        S=S,
        key=jax.random.fold_in(key, 1),
        update_idx=jnp.int32(0),
    )


def _unpack_traj(fused, traj, boot):
    """Packed [T, rows, B] records -> learner-major [T, n*B(, F)] arrays.

    Agent lanes flatten into the stream axis (agent-major, matching the
    bootstrap's [n, B] -> [n*B] reshape)."""
    n, F = fused.n, fused.POLICY_FEATURES
    T = traj["action"].shape[0]
    B = traj["action"].shape[2]
    feats = traj["feats"].reshape(T, n, F, B)
    feats = jnp.transpose(feats, (0, 1, 3, 2)).reshape(T, n * B, F)
    flat = lambda x: x.reshape(T, n * B)
    return {
        "obs": feats,
        "action": flat(traj["action"]),
        "logp": flat(traj["logp"]),
        "value": flat(traj["value"]),
        "reward": flat(traj["reward"]),
        "cont": 1.0 - flat(traj["done"]).astype(jnp.float32),
        "valid": (flat(traj["action"]) >= 0).astype(jnp.float32),
    }, boot.reshape(n * B)


def _gae(traj, bootstrap, config: FusedPPOConfig):
    """[T, M] advantages / returns by reverse scan (standard GAE)."""

    def body(carry, tr):
        next_value, next_adv = carry
        delta = (
            tr["reward"]
            + config.discount * tr["cont"] * next_value
            - tr["value"]
        )
        adv = delta + (
            config.discount * config.gae_lambda * tr["cont"] * next_adv
        )
        return (tr["value"], adv), adv

    _, adv = jax.lax.scan(
        body,
        (bootstrap, jnp.zeros_like(bootstrap)),
        traj,
        reverse=True,
    )
    return adv, adv + traj["value"]


def _loss(params, mb, fused_amin, config: FusedPPOConfig):
    logits, value = forward(params, mb["obs"])
    logp_all = jax.nn.log_softmax(logits)
    # action indices: sampled actions are amin-based; -1 sentinels are
    # masked but must still index validly.
    aidx = jnp.maximum(mb["action"] - fused_amin, 0)
    logp = jnp.take_along_axis(logp_all, aidx[:, None], axis=1)[:, 0]
    mask = mb["valid"]
    denom = jnp.maximum(mask.sum(), 1.0)

    adv = mb["adv"]
    adv_mean = (adv * mask).sum() / denom
    adv_std = jnp.sqrt(((adv - adv_mean) ** 2 * mask).sum() / denom + 1e-8)
    adv = (adv - adv_mean) / adv_std

    ratio = jnp.exp(logp - mb["logp"])
    clipped = jnp.clip(ratio, 1.0 - config.clip_eps, 1.0 + config.clip_eps)
    policy_loss = (
        -(jnp.minimum(ratio * adv, clipped * adv) * mask).sum() / denom
    )
    value_loss = (((value - mb["ret"]) ** 2) * mask).sum() / denom
    entropy = (
        -(jax.nn.softmax(logits) * logp_all).sum(-1) * mask
    ).sum() / denom
    loss = (
        policy_loss
        + config.value_coef * value_loss
        - config.entropy_coef * entropy
    )
    return loss, {
        "policy_loss": policy_loss,
        "value_loss": value_loss,
        "entropy": entropy,
    }


def make_train_step(
    fused, config: FusedPPOConfig = FusedPPOConfig(),
    backend: str = "pallas", tile: int | None = None,
    interpret: bool | None = None,
):
    """Build the jitted ``state -> (state, metrics)`` fused-PPO update."""
    opt = _optimizer(config)
    amin = int(fused.amin)

    @jax.jit
    def train_step(state: FusedPPOState):
        key, k_perm = jax.random.split(state.key)
        S, traj_raw, boot = fused.rollout_collect(
            state.S, state.params, config.n_steps,
            backend=backend, tile=tile, interpret=interpret,
        )
        traj, bootstrap = _unpack_traj(fused, traj_raw, boot)
        adv, ret = _gae(traj, jax.lax.stop_gradient(bootstrap), config)
        data = {
            "obs": traj["obs"],
            "action": traj["action"],
            "logp": traj["logp"],
            "valid": traj["valid"],
            "adv": adv,
            "ret": ret,
        }
        n_items = config.n_steps * traj["reward"].shape[1]
        flat = jax.tree.map(
            lambda x: x.reshape((n_items,) + x.shape[2:]), data
        )
        mb_size = n_items // config.n_minibatches

        def epoch(carry, epoch_key):
            params, opt_state = carry
            order = jax.random.permutation(epoch_key, n_items)
            shuffled = jax.tree.map(lambda x: x[order], flat)
            batched = jax.tree.map(
                lambda x: x[: mb_size * config.n_minibatches].reshape(
                    (config.n_minibatches, mb_size) + x.shape[1:]
                ),
                shuffled,
            )

            def minibatch(carry, mb):
                params, opt_state = carry
                (_, metrics), grads = jax.value_and_grad(
                    _loss, has_aux=True
                )(params, mb, amin, config)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), metrics

            (params, opt_state), metrics = jax.lax.scan(
                minibatch, (params, opt_state), batched
            )
            return (params, opt_state), metrics

        (params, opt_state), metrics = jax.lax.scan(
            epoch,
            (state.params, state.opt_state),
            jax.random.split(k_perm, config.n_epochs),
        )

        metrics = jax.tree.map(jnp.mean, metrics)
        metrics["episodes"] = (1.0 - traj["cont"]).sum()
        metrics["mean_reward"] = (
            traj["reward"] * traj["valid"]
        ).sum() / jnp.maximum(traj["valid"].sum(), 1.0)
        new_state = FusedPPOState(
            params=params,
            opt_state=opt_state,
            S=S,
            key=key,
            update_idx=state.update_idx + 1,
        )
        return new_state, metrics

    return train_step
