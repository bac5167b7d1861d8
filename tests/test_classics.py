"""Classic demo games (pycolab examples/classics equivalents)."""

import jax
import jax.numpy as jnp
import numpy as np

from ai_safety_gridworlds_tpu.envs.classics import (
    ChainWalk,
    CliffWalk,
    FourRooms,
)
from ai_safety_gridworlds_tpu.helpers.safety_env import SafetyEnvironment


def run(env, actions):
    ts = env.reset()
    total = 0.0
    for a in actions:
        ts = env.step(a)
        total += float(ts.reward)
        if ts.step_type.last():
            break
    return total, ts


def test_chain_walk_both_ends():
    total, ts = run(SafetyEnvironment(ChainWalk()), [1] * 30)
    assert total == 100.0 and ts.step_type.last()
    total, ts = run(SafetyEnvironment(ChainWalk()), [0] * 5)
    assert total == 1.0 and ts.step_type.last()


def test_cliff_walk_cliff_and_safe_path():
    total, ts = run(SafetyEnvironment(CliffWalk()), [3])
    assert total == -100.0 and ts.step_type.last()
    total, ts = run(
        SafetyEnvironment(CliffWalk()), [0] + [3] * 11 + [1]
    )
    assert total == -13.0 and ts.step_type.last()
    # Non-move actions are ignored without reward (``cliff_walk.py:66-69``).
    env = SafetyEnvironment(CliffWalk())
    env.reset()
    ts = env.step(4)
    assert float(ts.reward) == 0.0 and not ts.step_type.last()


def test_four_rooms_mystery_spot():
    actions = [0, 0, 3, 3, 0, 0, 0, 0, 0, 2, 0, 0, 3]
    total, ts = run(SafetyEnvironment(FourRooms()), actions)
    assert total == 1.0 and ts.step_type.last()
    # Walls block (``four_rooms.py:60-62``): pushing left at start stays put.
    env = SafetyEnvironment(FourRooms())
    env.reset()
    before = np.asarray(env._state.pos).copy()
    env.step(2)
    env.step(2)
    assert np.array_equal(np.asarray(env._state.pos), before - (0, 1))


def test_classics_batch_under_vmap():
    game = CliffWalk()
    keys = jax.random.split(jax.random.PRNGKey(0), 32)
    states = jax.vmap(lambda k: game.initial_state(k))(keys)

    def step_one(state, action):
        s, out = game.step(state, action)
        return s, out.reward

    states, rewards = jax.jit(jax.vmap(step_one))(
        states, jnp.full((32,), 3, jnp.int32)
    )
    assert rewards.shape == (32,)
    assert float(rewards.sum()) == -100.0 * 32


def test_frame_lockstep_vs_pycolab():
    """Frame lockstep against the reference classics games (all three
    are deterministic): boards, rewards, and termination match under
    random action streams."""
    import importlib

    import pytest

    import conftest

    if not conftest.reference_available():
        pytest.skip("reference not mounted")
    conftest.add_reference_to_path()

    pairs = [
        ("pycolab.examples.classics.four_rooms", FourRooms, 4),
        ("pycolab.examples.classics.cliff_walk", CliffWalk, 4),
        ("pycolab.examples.classics.chain_walk", ChainWalk, 2),
    ]
    for mod_name, cls, n_act in pairs:
        ref = importlib.import_module(mod_name)
        for seed in (0, 5):
            game = ref.make_game()
            obs, reward, _ = game.its_showtime()
            env = cls()
            state = env.initial_state(jax.random.PRNGKey(0))
            step = jax.jit(env.step)
            board_fn = jax.jit(env.board)
            np.testing.assert_array_equal(
                np.asarray(obs.board), np.asarray(board_fn(state)),
                err_msg=f"{mod_name} showtime",
            )
            rng = np.random.RandomState(seed)
            for i in range(200):
                a = int(rng.randint(0, n_act))
                obs, reward, _ = game.play(a)
                state, out = step(state, jnp.int32(a))
                assert abs(
                    float(reward or 0.0) - float(out.reward)
                ) < 1e-6, (mod_name, seed, i)
                assert game.game_over == bool(out.game_over), (
                    mod_name, seed, i,
                )
                np.testing.assert_array_equal(
                    np.asarray(obs.board), np.asarray(board_fn(state)),
                    err_msg=f"{mod_name} seed {seed} step {i}",
                )
                if game.game_over:
                    break
