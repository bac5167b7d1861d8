"""Pallas TPU kernels for hot per-step ops.

The production compute path is the fully-fused multi-agent step kernels
(:mod:`.fused_firemaker`, :mod:`.fused_savanna`, :mod:`.fused_island_ma`)
— whole rollout chunks in one pallas kernel with all state resident in
VMEM — backed by the counter-based PRF of :mod:`.prng`. (Standalone
per-op kernels were benchmarked and removed: at gridworld sizes XLA's
fusion beats isolated kernels — findings in ``docs/KERNELS.md``.)
"""


def make_fused(env):
    """The fused single-kernel step driver for a multi-agent env instance,
    or ``None`` when the env (or its configuration) has no fused kernel —
    callers fall back to the generic vmapped ``ma_rollout`` path then.

    A config-driven fallback is logged loudly: the generic path is
    25-100x slower, and silently losing that is a perf bug in the making.
    """
    import logging

    name = getattr(env, "name", None)
    try:
        if name == "firemaker_ex_ma":
            from ai_safety_gridworlds_tpu.ops.fused_firemaker import (
                FusedFiremaker,
            )
            return FusedFiremaker(env)
        if name == "aintelope_savanna":
            from ai_safety_gridworlds_tpu.ops.fused_savanna import (
                FusedSavanna,
            )
            return FusedSavanna(env)
        if name == "island_navigation_ex_ma":
            from ai_safety_gridworlds_tpu.ops.fused_island_ma import (
                FusedIslandMa,
            )
            return FusedIslandMa(env)
        if name == "boat_race":
            from ai_safety_gridworlds_tpu.ops.fused_scalar import (
                FusedBoatRace,
            )
            return FusedBoatRace(env)
        if name == "island_navigation":
            from ai_safety_gridworlds_tpu.ops.fused_scalar import (
                FusedIslandNav,
            )
            return FusedIslandNav(env)
        if name == "boat_race_ex":
            from ai_safety_gridworlds_tpu.ops.fused_scalar import (
                FusedBoatRaceEx,
            )
            return FusedBoatRaceEx(env)
        if name == "island_navigation_ex":
            from ai_safety_gridworlds_tpu.ops.fused_scalar import (
                FusedIslandNavEx,
            )
            return FusedIslandNavEx(env)
        if name == "side_effects_sokoban":
            from ai_safety_gridworlds_tpu.ops.fused_scalar import (
                FusedSokoban,
            )
            return FusedSokoban(env)
        if name == "absent_supervisor":
            from ai_safety_gridworlds_tpu.ops.fused_scalar import (
                FusedAbsentSupervisor,
            )
            return FusedAbsentSupervisor(env)
        if name == "distributional_shift":
            from ai_safety_gridworlds_tpu.ops.fused_scalar import (
                FusedDistributionalShift,
            )
            return FusedDistributionalShift(env)
        if name == "safe_interruptibility":
            from ai_safety_gridworlds_tpu.ops.fused_scalar import (
                FusedSafeInterruptibility,
            )
            return FusedSafeInterruptibility(env)
        if name == "whisky_gold":
            from ai_safety_gridworlds_tpu.ops.fused_scalar import (
                FusedWhiskyGold,
            )
            return FusedWhiskyGold(env)
        if name in ("tomato_watering", "tomato_crmdp"):
            from ai_safety_gridworlds_tpu.ops.fused_scalar import (
                FusedTomatoWatering,
            )
            return FusedTomatoWatering(env)
        if name == "conveyor_belt":
            from ai_safety_gridworlds_tpu.ops.fused_scalar import (
                FusedConveyorBelt,
            )
            return FusedConveyorBelt(env)
        if name == "rocks_diamonds":
            from ai_safety_gridworlds_tpu.ops.fused_scalar import (
                FusedRocksDiamonds,
            )
            return FusedRocksDiamonds(env)
        if name == "conveyor_belt_ex":
            from ai_safety_gridworlds_tpu.ops.fused_scalar import (
                FusedConveyorBeltEx,
            )
            return FusedConveyorBeltEx(env)
        if name == "safe_interruptibility_ex":
            from ai_safety_gridworlds_tpu.ops.fused_scalar import (
                FusedSafeInterruptibilityEx,
            )
            return FusedSafeInterruptibilityEx(env)
        if name == "friend_foe":
            from ai_safety_gridworlds_tpu.ops.fused_scalar import (
                FusedFriendFoe,
            )
            return FusedFriendFoe(env)
    except NotImplementedError as e:
        logging.getLogger(__name__).warning(
            "%s has a fused kernel, but this configuration is not "
            "supported by it (%s); falling back to the generic vmapped "
            "path (~25-100x slower).",
            name,
            e,
        )
        return None
    return None


def __getattr__(name):
    # Lazy heavyweight kernel classes (importing them pulls in env modules).
    if name == "FusedFiremaker":
        from ai_safety_gridworlds_tpu.ops.fused_firemaker import FusedFiremaker
        return FusedFiremaker
    if name == "FusedSavanna":
        from ai_safety_gridworlds_tpu.ops.fused_savanna import FusedSavanna
        return FusedSavanna
    if name == "FusedIslandMa":
        from ai_safety_gridworlds_tpu.ops.fused_island_ma import FusedIslandMa
        return FusedIslandMa
    if name == "FusedBoatRace":
        from ai_safety_gridworlds_tpu.ops.fused_scalar import FusedBoatRace
        return FusedBoatRace
    if name == "FusedIslandNav":
        from ai_safety_gridworlds_tpu.ops.fused_scalar import FusedIslandNav
        return FusedIslandNav
    if name.startswith("Fused"):
        # All remaining kernel classes live in the scalar-family module.
        from ai_safety_gridworlds_tpu.ops import fused_scalar

        if hasattr(fused_scalar, name):
            return getattr(fused_scalar, name)
    raise AttributeError(name)
