"""AIntelope experiment presets: smoke over all 12 + lockstep vs reference."""

import importlib

import numpy as np
import pytest

import conftest
from ai_safety_gridworlds_tpu.experiments import aintelope_presets
from ai_safety_gridworlds_tpu.mo.safety_game_mo import reset_class_statics
from ai_safety_gridworlds_tpu.mo.map_randomization import (
    clear_randomization_cache,
)
from test_aintelope_savanna import run_lockstep


@pytest.mark.parametrize(
    "name", aintelope_presets.aintelope_experiment_names()
)
def test_aintelope_experiment_smoke(name):
    reset_class_statics()
    clear_randomization_cache()
    env = aintelope_presets.make_aintelope_experiment(name)
    ts = env.reset()
    rng = np.random.RandomState(11)
    agents = env.agent_names
    for _ in range(20):
        actions = {a: int(rng.randint(0, 5)) for a in agents}
        ts = env.step(actions)
        if all(
            int(ts.step_type[a]) != 1 for a in agents
        ):  # all LAST/DEAD
            ts = env.reset()
    for a in ts.reward or {}:
        assert np.all(np.isfinite(np.asarray(ts.reward[a])))


def make_experiment_pair(module_name):
    if not conftest.reference_available():
        pytest.skip("reference not mounted")
    conftest.add_reference_to_path()
    from test_aintelope_savanna import make_pair as _shim_make_pair  # noqa: F401

    # Run the savanna shims (module attr + showtime reward fix) by importing
    # the shared harness and letting the reference modules import cleanly.
    import numpy as _np
    from ai_safety_gridworlds.environments.shared import (
        safety_game_ma as _sgma,
        safety_game_moma as _sgmoma,
    )

    if not hasattr(_sgmoma, "safety_game_ma"):
        _sgmoma.safety_game_ma = _sgma

    mod = importlib.import_module(
        f"ai_safety_gridworlds.experiments.aintelope.{module_name}"
    )
    RefExp = mod.AIntelopeSavannaEnvironmentMaExperiment
    for klass in (RefExp,) + tuple(RefExp.__mro__[1:2]):
        for attr in (
            "episode_no", "env_layout_seed", "env_seed",
            "next_experiment_no", "prev_experiment_no",
            "create_new_log_file", "log_file_handle", "log_filename",
            "flags", "log_arguments", "metrics_keys",
            "enabled_reward_dimension_keys",
            "enabled_agents_reward_dimensions", "log_filename_comment",
        ):
            if attr in klass.__dict__:
                delattr(klass, attr)

    reset_class_statics()
    clear_randomization_cache()
    try:
        _sgma.randomized_maps_per_environment.clear()
    except AttributeError:
        pass

    ref = RefExp(FLAGS=mod.init_experiment_flags())
    ours = aintelope_presets.make_aintelope_experiment(module_name)
    return ref, ours


@pytest.mark.parametrize(
    "module_name,steps,seed",
    [
        ("food_drink_homeostasis", 250, 90),
        ("food_sharing", 250, 91),
        ("food_sustainability", 300, 92),
        ("savanna_demo", 250, 93),
        ("danger_tiles", 150, 94),
        ("predators", 200, 95),
        ("food_unbounded", 120, 96),
        ("food_homeostasis", 150, 97),
        ("food_drink_homeostasis_gold", 150, 98),
        ("food_drink_homeostasis_gold_silver", 150, 99),
        ("food_drink_homeostasis_danger_gold_silver", 150, 100),
        ("food_drink_homeostasis_predators_gold_silver", 150, 101),
    ],
)
def test_aintelope_experiment_lockstep(module_name, steps, seed):
    ref, ours = make_experiment_pair(module_name)
    run_lockstep(ref, ours, n_steps=steps, seed=seed)
