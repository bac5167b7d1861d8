"""Profiling harness tests (CPU, tiny sizes)."""

from ai_safety_gridworlds_tpu.envs.boat_race import BoatRace
from ai_safety_gridworlds_tpu.utils.profiling import (
    measure_steps_per_second,
    per_step_latency,
)


def test_measure_steps_per_second():
    stats = measure_steps_per_second(
        BoatRace(), batch_size=64, n_steps=32, n_reps=2
    )
    assert stats["steps_per_sec"] > 0
    assert stats["total_steps"] == 2 * 32 * 64
    assert "device" in stats


def test_per_step_latency():
    stats = per_step_latency(BoatRace(), n_steps=10)
    assert stats["seconds_per_step"] > 0
