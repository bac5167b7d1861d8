"""firemaker_ex_ma lockstep parity vs the (shimmed) reference.

The reference as shipped cannot even be constructed: (a)
``safety_game_moma.py:1636`` references an un-imported ``safety_game_ma``
name, and (b) its ``reset`` path aggregates showtime rewards into an
uninitialised ``_last_reward=None`` (``pycolab_interface_ma.py:420``),
which crashes for any env whose drapes emit rewards at showtime (firemaker's
fire drape does). The oracle here is the reference plus the two minimal
shims below.
"""

import numpy as np
import pytest

import conftest
from ai_safety_gridworlds_tpu.core.timestep import StepType
from ai_safety_gridworlds_tpu.envs.firemaker_ex_ma import FiremakerExMa
from ai_safety_gridworlds_tpu.ma.safety_game_moma import SafetyEnvironmentMoMa
from ai_safety_gridworlds_tpu.mo.safety_game_mo import reset_class_statics


def make_pair(wrapper_kwargs=None, ref_overrides=None, our_overrides=None,
              **kwargs):
    if not conftest.reference_available():
        pytest.skip("reference not mounted")
    conftest.add_reference_to_path()
    import absl.flags  # noqa: F401  (import-order requirement upstream)
    from ai_safety_gridworlds.environments.shared import (
        safety_game_ma as _sgma,
        safety_game_moma as _sgmoma,
    )
    from ai_safety_gridworlds.environments.shared.ma_reward import ma_reward
    from ai_safety_gridworlds.environments.shared.rl import (
        pycolab_interface_ma as _pima,
    )

    if not hasattr(_sgmoma, "safety_game_ma"):
        _sgmoma.safety_game_ma = _sgma
    if not getattr(_pima.EnvironmentMa, "_none_reward_shimmed", False):
        orig = _pima.EnvironmentMa._update_for_game_step

        def patched(self, observations, reward, discount):
            if self._last_reward is None:
                self._last_reward = ma_reward({})
            return orig(self, observations, reward, discount)

        _pima.EnvironmentMa._update_for_game_step = patched
        _pima.EnvironmentMa._none_reward_shimmed = True

    # Third upstream bug: the fire drape calls ``.rand()`` on a numpy
    # Generator (``firemaker_ex_ma.py:615,621``) — Generators only have
    # ``.random()``. Shim via a Generator subclass injected through the
    # seeding helper (same PCG64 stream; rand() == random()).
    class _GeneratorWithRand(np.random.Generator):
        def rand(self):
            return self.random()

    if not getattr(_sgmoma.seeding, "_rand_shimmed", False):
        _orig_np_random = _sgmoma.seeding.np_random

        def _np_random(seed=None):
            rng, seed_out = _orig_np_random(seed)
            return (
                _GeneratorWithRand(np.random.PCG64(np.random.SeedSequence(seed))),
                seed_out,
            )

        _sgmoma.seeding.np_random = _np_random
        _sgmoma.seeding._rand_shimmed = True

    from ai_safety_gridworlds.environments.firemaker_ex_ma import (
        FiremakerExMa as RefFiremaker,
        define_flags,
    )

    reset_class_statics()
    flags_obj = define_flags()
    ref_kwargs = dict(kwargs)
    if "randomize_agent_actions_order" in ref_kwargs:
        flags_obj.randomize_agent_actions_order = ref_kwargs.pop(
            "randomize_agent_actions_order"
        )
    wrapper_kwargs = dict(wrapper_kwargs or {})
    ref_wrapper_kwargs = {
        k: v for k, v in wrapper_kwargs.items()
        if k != "reference_csv_format"
    }
    ref_wrapper_kwargs.update(ref_overrides or {})
    our_wrapper_kwargs = dict(wrapper_kwargs, **(our_overrides or {}))
    ref = RefFiremaker(FLAGS=flags_obj, **ref_kwargs, **ref_wrapper_kwargs)
    ours = SafetyEnvironmentMoMa(
        FiremakerExMa(**kwargs), **our_wrapper_kwargs
    )
    return ref, ours


def run_lockstep(ref, ours, n_steps=150, seed=70):
    agents = ours.agent_names
    for a in agents:
        assert (
            ref.enabled_agents_reward_dimensions[a]
            == ours.enabled_agents_reward_dimensions[a]
        ), a
    rng = np.random.RandomState(seed)
    ref_ts = ref.reset()
    our_ts = ours.reset()
    np.testing.assert_array_equal(
        ref_ts.observation["board"], our_ts.observation["board"]
    )
    for i in range(n_steps):
        types = ref_ts.step_type
        actions = {}
        for a in agents:
            st = types[a] if isinstance(types, dict) else types
            if int(st) in (int(StepType.LAST), int(StepType.DEAD)):
                continue
            actions[a] = int(rng.randint(0, 5))
        if not actions:
            ref_ts = ref.reset()
            our_ts = ours.reset()
            continue

        ref_gen_state = ref.environment_data["np_random"].bit_generator.state
        ref_ts = ref.step(actions)
        ours._np_random.bit_generator.state = ref_gen_state
        our_ts = ours.step(dict(actions))

        ref_types = ref_ts.step_type
        for a in agents:
            assert int(ref_types[a]) == int(our_ts.step_type[a]), (i, a)
        for a in ref_ts.reward:
            np.testing.assert_allclose(
                np.asarray(ref_ts.reward[a], dtype=np.float64),
                np.asarray(our_ts.reward[a], dtype=np.float64),
                err_msg=f"step {i} agent {a}",
            )
        np.testing.assert_array_equal(
            ref_ts.observation["board"],
            our_ts.observation["board"],
            err_msg=f"step {i}",
        )
        ref_m = dict(ref_ts.observation["metrics_dict"])
        our_m = our_ts.observation["metrics_dict"]
        assert set(ref_m) == set(our_m), i
        for k in ref_m:
            assert float(ref_m[k]) == pytest.approx(float(our_m[k])), (i, k)


def test_lockstep_default():
    ref, ours = make_pair()
    run_lockstep(ref, ours, seed=70)


def test_lockstep_more_steps_fire_dynamics():
    # Longer horizon so fires actually ignite, spread, and die out.
    ref, ours = make_pair()
    run_lockstep(ref, ours, n_steps=400, seed=71)


def test_lockstep_no_shuffle():
    ref, ours = make_pair(randomize_agent_actions_order=False)
    run_lockstep(ref, ours, seed=72)


def _ref_sprites(ref):
    for attr in ("_current_game", "current_game", "_game"):
        g = getattr(ref, attr, None)
        if g is not None and hasattr(g, "_sprites_and_drapes"):
            return {
                c: s
                for c, s in g._sprites_and_drapes.items()
                if hasattr(s, "position")
            }
    raise AttributeError("reference game not found")


def test_lockstep_dict_actions_with_direction_modalities():
    """Dict actions carrying ``action_direction`` / ``observation_direction``
    / expression entries agree with the reference under relative direction
    modes (``pycolab_interface_ma.py:192-207``, ``safety_game_ma.py:650-766``,
    ``firemaker_ex_ma.py:830-839``)."""
    ref, ours = make_pair(
        action_direction_mode=1, observation_direction_mode=1
    )
    agents = ours.agent_names
    rng = np.random.RandomState(77)
    ref_ts = ref.reset()
    our_ts = ours.reset()
    for i in range(120):
        types = ref_ts.step_type
        actions = {}
        for a in agents:
            st = types[a] if isinstance(types, dict) else types
            if int(st) in (int(StepType.LAST), int(StepType.DEAD)):
                continue
            act = {"step": int(rng.randint(0, 5))}
            if rng.rand() < 0.4:
                act["action_direction"] = int(rng.randint(0, 5))
            if rng.rand() < 0.4:
                act["observation_direction"] = int(rng.randint(0, 5))
            if rng.rand() < 0.3:
                act["expression_smile"] = float(rng.rand())
            actions[a] = act
        if not actions:
            ref_ts = ref.reset()
            our_ts = ours.reset()
            continue

        ref_gen_state = ref.environment_data["np_random"].bit_generator.state
        ref_ts = ref.step({a: dict(v) for a, v in actions.items()})
        ours._np_random.bit_generator.state = ref_gen_state
        our_ts = ours.step({a: dict(v) for a, v in actions.items()})

        np.testing.assert_array_equal(
            ref_ts.observation["board"],
            our_ts.observation["board"],
            err_msg=f"step {i}",
        )
        for a in ref_ts.reward:
            np.testing.assert_allclose(
                np.asarray(ref_ts.reward[a], dtype=np.float64),
                np.asarray(our_ts.reward[a], dtype=np.float64),
                err_msg=f"step {i} agent {a}",
            )
        sprites = _ref_sprites(ref)
        for idx, a in enumerate(agents):
            assert int(sprites[a].observation_direction) == int(
                np.asarray(ours._state.observation_direction[idx])
            ), (i, a, "observation_direction")
            assert int(sprites[a].action_direction) == int(
                np.asarray(ours._state.action_direction[idx])
            ), (i, a, "action_direction")


def test_unknown_action_modality_raises():
    _, ours = make_pair()
    ours.reset()
    with pytest.raises(RuntimeError):
        ours.step({"1": {"step": 1, "bogus_modality": 3}})


def test_multimodal_action_spec():
    """MA action spec mirrors the reference's [discrete(3,), continuous]
    structure (``pycolab_interface_ma.py:298-380``)."""
    _, ours = make_pair()
    spec = ours.action_spec()
    assert isinstance(spec, list) and len(spec) == 2
    discrete, continuous = spec
    assert discrete.name == "discrete" and discrete.shape == (3,)
    assert discrete.dtype == "int32"
    assert list(np.asarray(discrete.minimum)) == [0, 0, 0]
    assert list(np.asarray(discrete.maximum)) == [4, 4, 4]
    assert continuous.name == "continuous" and continuous.shape == (8,)
    assert continuous.dtype == "float32"


def test_supervisor_perspective_is_whole_map():
    ref, ours = make_pair()
    our_ts = ours.reset()
    persp = ours.agent_perspectives_with_layers(
        our_ts.observation, include_layers=False
    )
    # Worker radius [2,2,2,2] -> 5x5; supervisor None -> agent-centric
    # whole-board view of size (2H-1, 2W-1).
    assert persp["1"]["board"].shape == (5, 5)
    h, w = 17, 17
    assert persp["S"]["board"].shape == (2 * h - 1, 2 * w - 1)
