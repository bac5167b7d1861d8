"""PPO learner + orbax checkpoint/resume.

The reference has no learner or training checkpoints (SURVEY §5); these
tests pin the rebuild's training path: the jitted PPO update learns a
gridworld policy, and the whole run state round-trips through orbax
bit-exactly (resume determinism: train-then-restore == train straight
through)."""

import jax
import jax.numpy as jnp

from ai_safety_gridworlds_tpu.envs.island_navigation import IslandNavigation
from ai_safety_gridworlds_tpu.learners import ppo
from ai_safety_gridworlds_tpu.utils import checkpoint as ckpt


SMALL = ppo.PPOConfig(n_steps=8, n_epochs=2, n_minibatches=2, hidden=32)


def _trees_equal(a, b):
    eq = jax.tree.map(lambda x, y: bool(jnp.array_equal(x, y)), a, b)
    return all(jax.tree.leaves(eq))


def test_checkpoint_roundtrip(tmp_path):
    env = IslandNavigation()
    state = ppo.init_train_state(
        env, jax.random.PRNGKey(3), batch_size=4, config=SMALL
    )
    path = str(tmp_path / "ckpt")
    ckpt.save_pytree(path, state)
    restored = ckpt.restore_pytree(path, jax.eval_shape(lambda: state))
    assert _trees_equal(state, restored)


def test_resume_determinism(tmp_path):
    env = IslandNavigation()
    step = ppo.make_train_step(env, SMALL)
    state = ppo.init_train_state(
        env, jax.random.PRNGKey(0), batch_size=16, config=SMALL
    )

    straight = state
    for _ in range(4):
        straight, _ = step(straight)

    half = state
    for _ in range(2):
        half, _ = step(half)
    path = str(tmp_path / "mid")
    ckpt.save_pytree(path, half)
    resumed = ckpt.restore_pytree(path, jax.eval_shape(lambda: half))
    for _ in range(2):
        resumed, _ = step(resumed)

    assert int(resumed.update_idx) == int(straight.update_idx) == 4
    assert _trees_equal(straight.params, resumed.params)
    assert _trees_equal(straight.ep_batch, resumed.ep_batch)
    assert bool(jnp.array_equal(straight.key, resumed.key))


def test_checkpoint_manager_retention(tmp_path):
    env = IslandNavigation()
    state = ppo.init_train_state(
        env, jax.random.PRNGKey(1), batch_size=2, config=SMALL
    )
    with ckpt.CheckpointManager(
        str(tmp_path / "mgr"), max_to_keep=2, save_interval_steps=2
    ) as mgr:
        assert mgr.latest_step() is None
        for i in range(7):
            mgr.save(i, state)
        assert mgr.latest_step() == 6
        restored = mgr.restore(6, jax.eval_shape(lambda: state))
        assert _trees_equal(state, restored)


def test_ppo_learns_island_navigation():
    env = IslandNavigation()
    config = ppo.PPOConfig(n_steps=32, lr=7e-4, entropy_coef=0.01)
    state = ppo.init_train_state(
        env, jax.random.PRNGKey(0), batch_size=128, config=config
    )
    step = ppo.make_train_step(env, config)
    state, first = step(state)
    for _ in range(80):
        state, metrics = step(state)
    # Random policy averages ~-0.3 reward/step; the learned policy heads
    # to the goal (+50) and clears +1.5 comfortably (~+4 at convergence).
    assert float(first["mean_reward"]) < 0.5
    assert float(metrics["mean_reward"]) > 1.5
