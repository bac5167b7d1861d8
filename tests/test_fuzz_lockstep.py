"""Randomized lockstep fuzz harness: every factory name vs the reference.

The scripted lockstep suites replay hand-written action strings; this
harness instead drives EVERY one of the 47 registry names
(`helpers/factory.py`; oracle
`/root/reference/ai_safety_gridworlds/helpers/factory.py:185`) for K
random (seed, action-script) pairs in lockstep against the mounted
reference, asserting boards, rewards, discounts, step types, and final
performance each run. Any divergence it ever finds should be frozen into
a pinned regression case in the relevant per-env suite.

Knobs (env vars):
  FUZZ_K      runs per name            (default 2 — cheap CI insurance)
  FUZZ_SALT   offsets every derived seed (set to fuzz a fresh region)
  FUZZ_STEPS  overrides the per-run step count (default: seed-derived)

Seeds are derived from crc32(name) so CI is deterministic; export
FUZZ_SALT=$RANDOM FUZZ_K=20 for a long randomized soak.

Pair construction reuses the per-family builders from the scripted
suites (reference flag purges, upstream shims, class-static resets),
so a fuzz run exercises exactly the code paths users get from
``factory.get_environment_obj`` on both sides.
"""

import importlib
import os
import zlib

import numpy as np
import pytest

import conftest
from ai_safety_gridworlds_tpu.helpers import factory
from ai_safety_gridworlds_tpu.helpers.safety_env import SafetyEnvironment
from ai_safety_gridworlds_tpu.mo.safety_game_mo import (
    SafetyEnvironmentMo,
    reset_class_statics,
)

K = int(os.environ.get("FUZZ_K", "2"))
SALT = int(os.environ.get("FUZZ_SALT", "0"))
STEPS_OVERRIDE = int(os.environ.get("FUZZ_STEPS", "0"))


def _seeds(name):
    base = (zlib.crc32(name.encode()) ^ SALT) & 0x7FFFFF
    return [(base + 7919 * k) % 99991 for k in range(K)]


def _steps(seed, lo, span):
    return STEPS_OVERRIDE or lo + seed % span


def _action_range(spec):
    """(lo, hi) ints from a dm_env action spec, QUIT (9) excluded."""
    if isinstance(spec, (list, tuple)):
        spec = spec[0]
    if isinstance(spec, dict):
        spec = next(iter(spec.values()))
    lo, hi = int(np.min(spec.minimum)), int(np.max(spec.maximum))
    return lo, min(hi, 8)


# ---------------------------------------------------------------------------
# Comparators
# ---------------------------------------------------------------------------


def fuzz_scalar(make_ref, make_us, seed, check_rgb=True):
    """Scalar-suite lockstep with a fuzzed action script: identical
    global-numpy seeding at construction/reset, snapshot/restore around
    steps (auto-resets draw from the global stream inside step())."""
    rng = np.random.RandomState(seed)
    np.random.seed(seed)
    ref = make_ref()
    np.random.seed(seed)
    ours = make_us()
    lo, hi = _action_range(ref.action_spec())
    n_steps = _steps(seed, 60, 91)

    np.random.seed(seed)
    ref_ts = ref.reset()
    np.random.seed(seed)
    our_ts = ours.reset()
    np.testing.assert_array_equal(
        ref_ts.observation["board"], our_ts.observation["board"]
    )
    for i in range(n_steps):
        a = int(rng.randint(lo, hi + 1))
        rng_state = np.random.get_state()
        ref_ts = ref.step(a)
        np.random.set_state(rng_state)
        our_ts = ours.step(a)
        assert int(ref_ts.step_type) == int(our_ts.step_type), (seed, i)
        if ref_ts.step_type.first():
            assert our_ts.reward is None
            np.testing.assert_array_equal(
                ref_ts.observation["board"], our_ts.observation["board"]
            )
            continue
        assert ref_ts.reward == pytest.approx(our_ts.reward), (seed, i)
        assert ref_ts.discount == our_ts.discount, (seed, i)
        np.testing.assert_array_equal(
            ref_ts.observation["board"],
            our_ts.observation["board"],
            err_msg=f"seed {seed} step {i}",
        )
        if check_rgb:
            np.testing.assert_array_equal(
                ref_ts.observation["RGB"], our_ts.observation["RGB"]
            )
    rp = ref.get_overall_performance()
    if rp is not None:
        assert rp == pytest.approx(ours.get_overall_performance()), seed


def fuzz_mo(ref, ours, seed, sync_generator=True):
    """MO lockstep with a fuzzed action script: the reference carries an
    entropy-seeded Generator in environment_data; adopt its state into
    ours each step so stochastic draws line up."""
    rng = np.random.RandomState(seed)
    lo, hi = _action_range(ref.action_spec())
    n_steps = _steps(seed, 60, 91)

    def sync():
        if sync_generator and "np_random" in ref.environment_data:
            ours._np_random.bit_generator.state = ref.environment_data[
                "np_random"
            ].bit_generator.state

    sync()
    ref_ts = ref.reset()
    our_ts = ours.reset()
    np.testing.assert_array_equal(
        ref_ts.observation["board"], our_ts.observation["board"]
    )
    for i in range(n_steps):
        a = int(rng.randint(lo, hi + 1))
        sync()
        rng_state = np.random.get_state()
        ref_ts = ref.step(a)
        np.random.set_state(rng_state)
        our_ts = ours.step(a)
        assert int(ref_ts.step_type) == int(our_ts.step_type), (seed, i)
        if ref_ts.step_type.first():
            assert our_ts.reward is None
            np.testing.assert_array_equal(
                ref_ts.observation["board"], our_ts.observation["board"]
            )
            continue
        np.testing.assert_allclose(
            np.asarray(ref_ts.reward, np.float64),
            np.asarray(our_ts.reward, np.float64),
            err_msg=f"seed {seed} step {i}",
            atol=1e-6,
        )
        assert ref_ts.discount == our_ts.discount, (seed, i)
        np.testing.assert_array_equal(
            ref_ts.observation["board"],
            our_ts.observation["board"],
            err_msg=f"seed {seed} step {i}",
        )


# ---------------------------------------------------------------------------
# Pair builders per factory name
# ---------------------------------------------------------------------------

SCALAR_VIA_SUITE1 = {
    "island_navigation",
    "distributional_shift",
    "absent_supervisor",
    "whisky_gold",
    "safe_interruptibility",
    "conveyor_belt",
    "side_effects_sokoban",
}

SCALAR_DIRECT = {
    # name -> (reference module, reference class, our module, our class)
    "boat_race": (
        "ai_safety_gridworlds.environments.boat_race",
        "BoatRaceEnvironment",
        "ai_safety_gridworlds_tpu.envs.boat_race",
        "BoatRace",
    ),
    "tomato_watering": (
        "ai_safety_gridworlds.environments.tomato_watering",
        "TomatoWateringEnvironment",
        "ai_safety_gridworlds_tpu.envs.tomato_watering",
        "TomatoWatering",
    ),
    "tomato_crmdp": (
        "ai_safety_gridworlds.environments.tomato_crmdp",
        "TomatoCRMDPEnvironment",
        "ai_safety_gridworlds_tpu.envs.tomato_watering",
        "TomatoCRMDP",
    ),
    "rocks_diamonds": (
        "ai_safety_gridworlds.environments.rocks_diamonds",
        "RocksDiamondsEnvironment",
        "ai_safety_gridworlds_tpu.envs.rocks_diamonds",
        "RocksDiamonds",
    ),
    "friend_foe": (
        "ai_safety_gridworlds.environments.friend_foe",
        "FriendFoeEnvironment",
        "ai_safety_gridworlds_tpu.envs.friend_foe",
        "FriendFoe",
    ),
}

CONVEYOR_VARIANTS = {
    "conveyor_belt_vase": "vase",
    "conveyor_belt_sushi": "sushi",
    "conveyor_belt_sushi_goal": "sushi_goal",
    "conveyor_belt_sushi_goal2": "sushi_goal2",
}

MO_EXPERIMENTS = [
    "food_drink_bounded",
    "food_drink_rolf",
    "food_drink_bounded_death_gold_silver",
    "food_drink_unbounded",
    "food_bounded",
    "food_drink_bounded_death",
    "food_drink_bounded_gold",
    "food_drink_bounded_gold_silver",
    "food_drink_bounded_death_gold",
    "food_drink_rolf_gold_as_gap",
    "food_drink_rolf_gold_as_resource",
    "food_drink_rolf_gold_as_resource_scaled",
]

MA_ENVS = {"island_navigation_ex_ma", "aintelope_savanna", "firemaker_ex_ma"}

MA_EXPERIMENTS = [
    "food_drink_homeostasis",
    "food_sharing",
    "food_sustainability",
    "savanna_demo",
    "danger_tiles",
    "predators",
    "food_unbounded",
    "food_homeostasis",
    "food_drink_homeostasis_gold",
    "food_drink_homeostasis_gold_silver",
    "food_drink_homeostasis_danger_gold_silver",
    "food_drink_homeostasis_predators_gold_silver",
]

MO_ENVS = {
    "boat_race_ex",
    "island_navigation_ex",
    "conveyor_belt_ex",
    "safe_interruptibility_ex",
}

ALL_NAMES = sorted(
    SCALAR_VIA_SUITE1
    | set(SCALAR_DIRECT)
    | set(CONVEYOR_VARIANTS)
    | MO_ENVS
    | set(MO_EXPERIMENTS)
    | MA_ENVS
    | set(MA_EXPERIMENTS)
)


def test_fuzz_covers_entire_registry():
    """Every factory name is fuzzed; a newly registered env must be added
    to a fuzz family (this is the tripwire)."""
    assert ALL_NAMES == factory.env_names()


def _purged_flags_module(module_name, probe_flag):
    """Import a reference env module whose define_flags lacks the
    delete-all self-heal; purge the absl registry when its flags are
    missing (pattern from test_ex_variants)."""
    mod = importlib.import_module(module_name)
    from absl import flags as absl_flags

    if (
        not hasattr(mod, "_fuzz_cached_flags")
        or probe_flag not in absl_flags.FLAGS
    ):
        for name in list(absl_flags.FLAGS):
            delattr(absl_flags.FLAGS, name)
        absl_flags.DEFINE_bool("eval", False, "")
        mod._fuzz_cached_flags = mod.define_flags()
    return mod


def _run_one(name, seed):
    conftest.add_reference_to_path()

    if name in SCALAR_VIA_SUITE1:
        import test_scalar_envs as s1

        fuzz_scalar(
            lambda: s1.make_reference(name),
            lambda: s1.make_ours(name),
            seed,
        )
        return

    if name in SCALAR_DIRECT:
        ref_mod, ref_cls, our_mod, our_cls = SCALAR_DIRECT[name]
        if name == "friend_foe":
            # Upstream samples via np.random.choice on a list-of-lists
            # only for default bandit selection; handled identically.
            pass
        RefCls = getattr(importlib.import_module(ref_mod), ref_cls)
        OurCls = getattr(importlib.import_module(our_mod), our_cls)
        fuzz_scalar(RefCls, lambda: SafetyEnvironment(OurCls()), seed)
        return

    if name in CONVEYOR_VARIANTS:
        import test_scalar_envs as s1

        variant = CONVEYOR_VARIANTS[name]
        fuzz_scalar(
            lambda: s1.make_reference("conveyor_belt", variant=variant),
            lambda: s1.make_ours("conveyor_belt", variant=variant),
            seed,
        )
        return

    if name == "boat_race_ex":
        import test_boat_race_ex as t

        reset_class_statics()
        ref, ours = t.make_pair()
        fuzz_mo(ref, ours, seed)
        return

    if name == "island_navigation_ex":
        import test_island_navigation_ex as t

        reset_class_statics()
        ref, ours = t.make_pair()
        fuzz_mo(ref, ours, seed)
        return

    if name == "conveyor_belt_ex":
        import test_ex_variants as t

        t._shim_generator_rand()
        from ai_safety_gridworlds_tpu.envs.conveyor_belt_ex import (
            ConveyorBeltEx,
        )

        mod = _purged_flags_module(
            "ai_safety_gridworlds.environments.conveyor_belt_ex", "variant"
        )
        reset_class_statics()
        ref = mod.ConveyorBeltEnvironmentEx(FLAGS=mod._fuzz_cached_flags)
        ours = SafetyEnvironmentMo(ConveyorBeltEx())
        fuzz_mo(ref, ours, seed)
        return

    if name == "safe_interruptibility_ex":
        import test_ex_variants as t

        t._shim_generator_rand()
        from ai_safety_gridworlds_tpu.envs.safe_interruptibility_ex import (
            SafeInterruptibilityEx,
        )

        mod = _purged_flags_module(
            "ai_safety_gridworlds.environments.safe_interruptibility_ex",
            "interruption_probability",
        )
        reset_class_statics()
        ref = mod.SafeInterruptibilityEnvironmentEx(
            FLAGS=mod._fuzz_cached_flags
        )
        ours = SafetyEnvironmentMo(SafeInterruptibilityEx())
        fuzz_mo(ref, ours, seed)
        return

    if name in MO_EXPERIMENTS:
        mod = importlib.import_module(
            f"ai_safety_gridworlds.experiments.{name}"
        )
        from ai_safety_gridworlds_tpu.experiments import presets

        reset_class_statics()
        ref = mod.IslandNavigationEnvironmentExExperiment(
            FLAGS=mod.init_experiment_flags()
        )
        ours = presets.make_experiment(name)
        fuzz_mo(ref, ours, seed)
        return

    if name in MA_ENVS:
        if name == "island_navigation_ex_ma":
            import test_island_navigation_ex_ma as t
        elif name == "aintelope_savanna":
            import test_aintelope_savanna as t
        else:
            import test_firemaker_ex_ma as t

        ref, ours = t.make_pair()
        t.run_lockstep(ref, ours, n_steps=_steps(seed, 40, 51), seed=seed)
        return

    if name in MA_EXPERIMENTS:
        import test_aintelope_experiments as te
        import test_aintelope_savanna as ts

        ref, ours = te.make_experiment_pair(name)
        ts.run_lockstep(ref, ours, n_steps=_steps(seed, 40, 51), seed=seed)
        return

    raise AssertionError(f"no fuzz family for {name}")


@pytest.mark.parametrize("name", ALL_NAMES)
def test_fuzz_lockstep(name):
    if not conftest.reference_available():
        pytest.skip("reference not mounted")
    for seed in _seeds(name):
        _run_one(name, seed)
