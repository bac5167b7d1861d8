"""Pallas TPU kernels for hot per-step ops (see :mod:`.pallas_ops`)."""

from ai_safety_gridworlds_tpu.ops.pallas_ops import (  # noqa: F401
    compact_lut,
    fire_union_probability,
    fire_union_reference,
    value_map_batched,
    value_map_reference,
)
