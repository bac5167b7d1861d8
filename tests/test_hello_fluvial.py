"""hello_world + fluvial_natation: ASCII frame lockstep vs the reference
pycolab engine (both games are deterministic given the action string)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import conftest
from ai_safety_gridworlds_tpu.envs.fluvial_natation import FluvialNatation
from ai_safety_gridworlds_tpu.envs.hello_world import HelloWorld


def _ref_game(module_name):
    if not conftest.reference_available():
        pytest.skip("reference not mounted")
    conftest.add_reference_to_path()
    import importlib

    mod = importlib.import_module(f"pycolab.examples.{module_name}")
    return mod.make_game()


def _frames_match(ref_obs, board_codes, ctx):
    np.testing.assert_array_equal(
        np.asarray(ref_obs.board), np.asarray(board_codes), err_msg=ctx
    )


def run_lockstep(module_name, env, actions, quit_action=None):
    game = _ref_game(module_name)
    obs, reward, discount = game.its_showtime()
    state = env.initial_state(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    board_fn = jax.jit(env.board)
    _frames_match(obs, board_fn(state), "showtime")
    total_ref = 0.0
    total_ours = 0.0
    for i, a in enumerate(actions):
        obs, reward, discount = game.play(a)
        state, out = step(state, jnp.int32(a))
        total_ref += float(reward or 0.0)
        total_ours += float(out.reward)
        if game.game_over:
            assert bool(out.game_over), i
            _frames_match(obs, board_fn(state), f"terminal step {i}")
            break
        assert not bool(out.game_over), i
        _frames_match(obs, board_fn(state), f"step {i} action {a}")
    assert total_ref == pytest.approx(total_ours)


def test_hello_world_lockstep():
    rng = np.random.RandomState(3)
    run_lockstep("hello_world", HelloWorld(), [int(a) for a in rng.randint(0, 4, 60)])


def test_hello_world_quit():
    game = _ref_game("hello_world")
    game.its_showtime()
    env = HelloWorld()
    state = env.initial_state(jax.random.PRNGKey(0))
    obs, reward, discount = game.play(4)
    state, out = jax.jit(env.step)(state, jnp.int32(4))
    assert game.game_over and bool(out.game_over)


def test_fluvial_lockstep_win_and_lose():
    # Swimming east beats the current (net +1 every two frames).
    run_lockstep("fluvial_natation", FluvialNatation(), [1] * 200)
    # Drifting loses: the current carries the swimmer off the left edge.
    run_lockstep("fluvial_natation", FluvialNatation(), [2] * 60)


def test_fluvial_rewards():
    env = FluvialNatation()
    state = env.initial_state(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    total = 0.0
    for _ in range(300):
        state, out = step(state, jnp.int32(1))
        total += float(out.reward)
        if bool(out.game_over):
            break
    assert total == 1.0
    state = env.initial_state(jax.random.PRNGKey(0))
    total = 0.0
    for _ in range(300):
        state, out = step(state, jnp.int32(0))
        total += float(out.reward)
        if bool(out.game_over):
            break
    assert total == -1.0


def test_batched_vmap():
    for env in (HelloWorld(), FluvialNatation()):
        keys = jax.random.split(jax.random.PRNGKey(0), 32)
        states = jax.vmap(lambda k: env.initial_state(k))(keys)
        step = jax.jit(jax.vmap(env.step))
        states, outs = step(
            states, jnp.zeros((32,), jnp.int32)
        )
        assert outs.reward.shape == (32,)
