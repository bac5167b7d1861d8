"""Experiment preset tests: smoke over all presets + lockstep vs reference."""

import numpy as np
import pytest

import conftest
from ai_safety_gridworlds_tpu.experiments import presets
from ai_safety_gridworlds_tpu.mo.safety_game_mo import reset_class_statics


@pytest.mark.parametrize("name", presets.experiment_names())
def test_experiment_smoke(name):
    reset_class_statics()
    env = presets.make_experiment(name)
    ts = env.reset()
    rng = np.random.RandomState(11)
    for _ in range(20):
        ts = env.step(int(rng.randint(0, 5)))
    assert ts.reward is None or np.all(np.isfinite(np.asarray(ts.reward)))


@pytest.mark.parametrize(
    "name,ref_module",
    [
        ("food_drink_bounded", "food_drink_bounded"),
        ("food_drink_rolf", "food_drink_rolf"),
        ("food_drink_bounded_death_gold_silver",
         "food_drink_bounded_death_gold_silver"),
        ("food_drink_unbounded", "food_drink_unbounded"),
        ("food_bounded", "food_bounded"),
        ("food_drink_bounded_death", "food_drink_bounded_death"),
        ("food_drink_bounded_gold", "food_drink_bounded_gold"),
        ("food_drink_bounded_gold_silver", "food_drink_bounded_gold_silver"),
        ("food_drink_bounded_death_gold", "food_drink_bounded_death_gold"),
        ("food_drink_rolf_gold_as_gap", "food_drink_rolf_gold_as_gap"),
        ("food_drink_rolf_gold_as_resource",
         "food_drink_rolf_gold_as_resource"),
        ("food_drink_rolf_gold_as_resource_scaled",
         "food_drink_rolf_gold_as_resource_scaled"),
    ],
)
def test_experiment_lockstep(name, ref_module):
    if not conftest.reference_available():
        pytest.skip("reference not mounted")
    conftest.add_reference_to_path()
    import importlib

    mod = importlib.import_module(
        f"ai_safety_gridworlds.experiments.{ref_module}"
    )
    reset_class_statics()
    ref = mod.IslandNavigationEnvironmentExExperiment(
        FLAGS=mod.init_experiment_flags()
    )
    ours = presets.make_experiment(name)

    assert (
        ref.enabled_reward_dimension_keys == ours.enabled_reward_dimension_keys
    )
    rng = np.random.RandomState(12)
    ref_ts = ref.reset()
    our_ts = ours.reset()
    np.testing.assert_array_equal(
        ref_ts.observation["board"], our_ts.observation["board"]
    )
    for i in range(250):
        a = int(rng.randint(0, 5))
        ref_ts = ref.step(a)
        our_ts = ours.step(a)
        assert int(ref_ts.step_type) == int(our_ts.step_type), i
        if ref_ts.step_type.first():
            continue
        np.testing.assert_allclose(
            np.asarray(ref_ts.reward, np.float64),
            np.asarray(our_ts.reward, np.float64),
            err_msg=f"step {i}",
            atol=1e-6,
        )
        np.testing.assert_array_equal(
            ref_ts.observation["board"], our_ts.observation["board"]
        )
