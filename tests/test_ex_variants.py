"""conveyor_belt_ex and safe_interruptibility_ex lockstep parity."""

import numpy as np
import pytest

import conftest
from ai_safety_gridworlds_tpu.envs.conveyor_belt_ex import ConveyorBeltEx
from ai_safety_gridworlds_tpu.envs.safe_interruptibility_ex import (
    SafeInterruptibilityEx,
)
from ai_safety_gridworlds_tpu.mo.safety_game_mo import (
    SafetyEnvironmentMo,
    reset_class_statics,
)


def _shim_generator_rand():
    """The ex variants call ``.rand()`` on numpy Generators upstream."""
    conftest.add_reference_to_path()
    import numpy as np
    from ai_safety_gridworlds.environments.shared import safety_game_mo as m

    class _GeneratorWithRand(np.random.Generator):
        def rand(self):
            return self.random()

    if not getattr(m.seeding, "_rand_shimmed_mo", False):
        orig = m.seeding.np_random

        def _np_random(seed=None):
            rng, seed_out = orig(seed)
            return (
                _GeneratorWithRand(
                    np.random.PCG64(np.random.SeedSequence(seed))
                ),
                seed_out,
            )

        m.seeding.np_random = _np_random
        m.seeding._rand_shimmed_mo = True


def lockstep_mo(ref, ours, n_steps=250, seed=40, sync_generator=False):
    rng = np.random.RandomState(seed)
    actions = rng.randint(0, 5, size=n_steps)
    if sync_generator:
        # The reference may carry an entropy-seeded Generator (its
        # constructor only reseeds on layout change, and class statics
        # persist across instances); adopt its state wholesale.
        g = ref.environment_data["np_random"].bit_generator.state
        ours._np_random.bit_generator.state = g
    ref_ts = ref.reset()
    our_ts = ours.reset()
    np.testing.assert_array_equal(
        ref_ts.observation["board"], our_ts.observation["board"]
    )
    for i, a in enumerate(actions):
        if sync_generator:
            g = ref.environment_data["np_random"].bit_generator.state
            ours._np_random.bit_generator.state = g
        ref_ts = ref.step(int(a))
        our_ts = ours.step(int(a))
        assert int(ref_ts.step_type) == int(our_ts.step_type), i
        if ref_ts.step_type.first():
            assert our_ts.reward is None
            continue
        np.testing.assert_allclose(
            np.asarray(ref_ts.reward, np.float64),
            np.asarray(our_ts.reward, np.float64),
            err_msg=f"step {i}",
        )
        np.testing.assert_array_equal(
            ref_ts.observation["board"],
            our_ts.observation["board"],
            err_msg=f"step {i}",
        )


@pytest.mark.parametrize(
    "variant", ["vase", "sushi", "sushi_goal", "sushi_goal2"]
)
def test_lockstep_conveyor_belt_ex(variant):
    if not conftest.reference_available():
        pytest.skip("reference not mounted")
    conftest.add_reference_to_path()
    import ai_safety_gridworlds.environments.conveyor_belt_ex as ref_mod
    from absl import flags as absl_flags

    # Upstream define_flags lacks both an idempotence guard and the
    # delete-all self-heal other env modules have; purge and redefine
    # whenever its flags are absent (e.g. after another module's
    # delete-all define_flags ran).
    if (
        not hasattr(ref_mod, "_cached_flags")
        or "variant" not in absl_flags.FLAGS
    ):
        for name in list(absl_flags.FLAGS):
            delattr(absl_flags.FLAGS, name)
        absl_flags.DEFINE_bool("eval", False, "")
        ref_mod._cached_flags = ref_mod.define_flags()

    reset_class_statics()
    ref = ref_mod.ConveyorBeltEnvironmentEx(
        FLAGS=ref_mod._cached_flags, variant=variant
    )
    ours = SafetyEnvironmentMo(ConveyorBeltEx(variant=variant))
    assert (
        ref.enabled_reward_dimension_keys == ours.enabled_reward_dimension_keys
    )
    lockstep_mo(ref, ours, seed=40)


@pytest.mark.parametrize("level", [0, 1, 2])
def test_lockstep_safe_interruptibility_ex(level):
    if not conftest.reference_available():
        pytest.skip("reference not mounted")
    _shim_generator_rand()
    import ai_safety_gridworlds.environments.safe_interruptibility_ex as ref_mod
    from absl import flags as absl_flags

    if (
        not hasattr(ref_mod, "_cached_flags")
        or "interruption_probability" not in absl_flags.FLAGS
    ):
        # Purge flags left over from other env modules' define_flags (the
        # upstream guards are unreliable across modules).
        for name in list(absl_flags.FLAGS):
            delattr(absl_flags.FLAGS, name)
        absl_flags.DEFINE_bool("eval", False, "")
        ref_mod._cached_flags = ref_mod.define_flags()

    reset_class_statics()
    ref = ref_mod.SafeInterruptibilityEnvironmentEx(
        FLAGS=ref_mod._cached_flags, level=level
    )
    ours = SafetyEnvironmentMo(SafeInterruptibilityEx(level=level))
    assert (
        ref.enabled_reward_dimension_keys == ours.enabled_reward_dimension_keys
    )
    lockstep_mo(ref, ours, seed=41 + level, sync_generator=True)
