"""Environment factory and registry.

Mirrors ``ai_safety_gridworlds/helpers/factory.py``: every environment is
registered under its canonical snake_case name (and aliases), and
``get_environment_obj(name, *args, **kwargs)`` instantiates the stateful
environment shell. ``register_with_gym`` creates Gym/Gymnasium ids
(CamelCase-v0 and ``ai_safety_gridworlds.<name>-v0``,
``factory.py:205-273``).
"""

from __future__ import annotations

from typing import Callable, Dict

_registry: Dict[str, Callable] = {}
_raw_registry: Dict[str, Callable] = {}


def register(name: str, constructor: Callable, aliases=()):
    _registry[name] = constructor
    for alias in aliases:
        _registry[alias] = constructor


def register_raw(name: str, constructor: Callable):
    """Register the *functional* (unwrapped) env constructor for a name —
    the object ``ops.make_fused`` and the batched rollout drivers consume."""
    _raw_registry[name] = constructor


def _make_scalar(env_cls):
    from ai_safety_gridworlds_tpu.helpers.safety_env import SafetyEnvironment

    def ctor(*args, **kwargs):
        kwargs.pop("scalarise", None)  # scalar envs are already scalar
        seed = kwargs.pop("seed", None)
        return SafetyEnvironment(env_cls(*args, **kwargs), seed=seed)

    return ctor


def _make_mo(env_cls):
    from ai_safety_gridworlds_tpu.mo.safety_game_mo import SafetyEnvironmentMo

    def ctor(*args, **kwargs):
        wrapper_keys = (
            "scalarise",
            "seed",
            "log_columns",
            "log_dir",
            "log_arguments",
            "log_arguments_to_separate_file",
            "log_filename_comment",
            "gzip_log",
            "flags_dict",
        )
        wrapper_kwargs = {
            k: kwargs.pop(k) for k in list(kwargs) if k in wrapper_keys
        }
        return SafetyEnvironmentMo(env_cls(*args, **kwargs), **wrapper_kwargs)

    return ctor


def _make_moma(env_cls):
    from ai_safety_gridworlds_tpu.ma.safety_game_moma import (
        SafetyEnvironmentMoMa,
    )

    def ctor(*args, **kwargs):
        wrapper_keys = (
            "scalarise",
            "seed",
            "log_columns",
            "log_dir",
            "log_arguments",
            "log_arguments_to_separate_file",
            "log_filename_comment",
            "gzip_log",
            "flags_dict",
            "reference_csv_format",
        )
        wrapper_kwargs = {
            k: kwargs.pop(k) for k in list(kwargs) if k in wrapper_keys
        }
        return SafetyEnvironmentMoMa(env_cls(*args, **kwargs), **wrapper_kwargs)

    return ctor


def _populate():
    if _registry:
        return
    from ai_safety_gridworlds_tpu.envs.absent_supervisor import AbsentSupervisor
    from ai_safety_gridworlds_tpu.envs.boat_race import BoatRace
    from ai_safety_gridworlds_tpu.envs.boat_race_ex import BoatRaceEx
    from ai_safety_gridworlds_tpu.envs.conveyor_belt import ConveyorBelt
    from ai_safety_gridworlds_tpu.envs.distributional_shift import (
        DistributionalShift,
    )
    from ai_safety_gridworlds_tpu.envs.friend_foe import FriendFoe
    from ai_safety_gridworlds_tpu.envs.island_navigation import IslandNavigation
    from ai_safety_gridworlds_tpu.envs.island_navigation_ex import (
        IslandNavigationEx,
    )
    from ai_safety_gridworlds_tpu.envs.rocks_diamonds import RocksDiamonds
    from ai_safety_gridworlds_tpu.envs.safe_interruptibility import (
        SafeInterruptibility,
    )
    from ai_safety_gridworlds_tpu.envs.side_effects_sokoban import (
        SideEffectsSokoban,
    )
    from ai_safety_gridworlds_tpu.envs.tomato_watering import (
        TomatoCRMDP,
        TomatoWatering,
    )
    from ai_safety_gridworlds_tpu.envs.whisky_gold import WhiskyGold

    from ai_safety_gridworlds_tpu.envs.firemaker_ex_ma import FiremakerExMa
    from ai_safety_gridworlds_tpu.envs.island_navigation_ex_ma import (
        IslandNavigationExMa,
    )

    from ai_safety_gridworlds_tpu.envs.conveyor_belt_ex import ConveyorBeltEx
    from ai_safety_gridworlds_tpu.envs.safe_interruptibility_ex import (
        SafeInterruptibilityEx,
    )

    from ai_safety_gridworlds_tpu.envs.aintelope_savanna import (
        AIntelopeSavanna,
    )

    for raw_name, raw_cls in (
        ("boat_race", BoatRace),
        ("island_navigation_ex_ma", IslandNavigationExMa),
        ("aintelope_savanna", AIntelopeSavanna),
        ("firemaker_ex_ma", FiremakerExMa),
        ("conveyor_belt_ex", ConveyorBeltEx),
        ("safe_interruptibility_ex", SafeInterruptibilityEx),
        ("boat_race_ex", BoatRaceEx),
        ("island_navigation", IslandNavigation),
        ("island_navigation_ex", IslandNavigationEx),
        ("distributional_shift", DistributionalShift),
        ("absent_supervisor", AbsentSupervisor),
        ("whisky_gold", WhiskyGold),
        ("safe_interruptibility", SafeInterruptibility),
        ("side_effects_sokoban", SideEffectsSokoban),
        ("tomato_watering", TomatoWatering),
        ("tomato_crmdp", TomatoCRMDP),
        ("rocks_diamonds", RocksDiamonds),
        ("friend_foe", FriendFoe),
        ("conveyor_belt", ConveyorBelt),
    ):
        register_raw(raw_name, raw_cls)
    for variant in ("vase", "sushi", "sushi_goal", "sushi_goal2"):
        register_raw(
            f"conveyor_belt_{variant}",
            (lambda v: lambda **kw: ConveyorBelt(variant=v, **kw))(variant),
        )

    register("boat_race", _make_scalar(BoatRace))
    register("island_navigation_ex_ma", _make_moma(IslandNavigationExMa))
    register("aintelope_savanna", _make_moma(AIntelopeSavanna))
    register("firemaker_ex_ma", _make_moma(FiremakerExMa))
    register("conveyor_belt_ex", _make_mo(ConveyorBeltEx))
    register("safe_interruptibility_ex", _make_mo(SafeInterruptibilityEx))
    register("boat_race_ex", _make_mo(BoatRaceEx))
    register("island_navigation", _make_scalar(IslandNavigation))
    register("island_navigation_ex", _make_mo(IslandNavigationEx))
    register("distributional_shift", _make_scalar(DistributionalShift))
    register("absent_supervisor", _make_scalar(AbsentSupervisor))
    register("whisky_gold", _make_scalar(WhiskyGold))
    register("safe_interruptibility", _make_scalar(SafeInterruptibility))
    register("side_effects_sokoban", _make_scalar(SideEffectsSokoban))
    register("tomato_watering", _make_scalar(TomatoWatering))
    register("tomato_crmdp", _make_scalar(TomatoCRMDP))
    register("rocks_diamonds", _make_scalar(RocksDiamonds))
    register("friend_foe", _make_scalar(FriendFoe))
    register("conveyor_belt", _make_scalar(ConveyorBelt))
    # Conveyor belt variants get their own names
    # (``factory.py:248-271``).
    for variant in ("vase", "sushi", "sushi_goal", "sushi_goal2"):
        register(
            f"conveyor_belt_{variant}",
            (lambda v: _make_scalar(
                lambda **kw: ConveyorBelt(variant=v, **kw)
            ))(variant),
        )
    _populate_experiments()


def _populate_experiments():
    from ai_safety_gridworlds_tpu.experiments import aintelope_presets, presets

    for name in presets.experiment_names():
        register(
            name,
            (lambda n: lambda *a, **kw: presets.make_experiment(n, **kw))(
                name
            ),
        )
        register_raw(
            name,
            (lambda n: lambda **kw: presets.make_experiment_raw(n, **kw))(
                name
            ),
        )
    for name in aintelope_presets.aintelope_experiment_names():
        register(
            name,
            (
                lambda n: lambda *a, **kw: aintelope_presets.make_aintelope_experiment(
                    n, **kw
                )
            )(name),
        )
        register_raw(
            name,
            (
                lambda n: lambda **kw: aintelope_presets.make_aintelope_experiment_raw(
                    n, **kw
                )
            )(name),
        )


def env_names():
    _populate()
    return sorted(_registry.keys())


def get_environment_obj(name, *args, **kwargs):
    """Instantiate a registered environment (``factory.py:185-202``)."""
    _populate()
    if name not in _registry:
        raise NotImplementedError(
            f"The requested environment {name!r} is not available."
        )
    return _registry[name](*args, **kwargs)


def get_raw_env(name, **kwargs):
    """Instantiate the registered *functional* env (no stateful wrapper) —
    the pytree-native object consumed by ``core.base.rollout``,
    ``ma.safety_game_ma.ma_rollout``, and ``ops.make_fused``. Use
    :mod:`ai_safety_gridworlds_tpu.helpers.batched` for one-call batched
    rollouts that pick the fused kernel automatically."""
    _populate()
    if name not in _raw_registry:
        raise NotImplementedError(
            f"The requested environment {name!r} is not available."
        )
    return _raw_registry[name](**kwargs)


def _camel_case(name: str) -> str:
    return "".join(part.capitalize() for part in name.split("_"))


def register_with_gym():
    """Register all environments with gym/gymnasium under both id styles."""
    _populate()
    try:
        import gymnasium as gym
    except ImportError:  # pragma: no cover
        import gym

    from ai_safety_gridworlds_tpu.helpers.gridworld_gym_env import (
        GridworldGymEnv,
    )

    for name in list(_registry):
        for env_id in (
            f"{_camel_case(name)}-v0",
            f"ai_safety_gridworlds.{name}-v0",
        ):
            try:
                gym.register(
                    id=env_id,
                    entry_point="ai_safety_gridworlds_tpu.helpers."
                    "gridworld_gym_env:GridworldGymEnv",
                    kwargs={"env_name": name},
                )
            except Exception:
                pass  # already registered
