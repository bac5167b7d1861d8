"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
``--xla_force_host_platform_device_count=8`` to validate
``jax.sharding.Mesh`` programs without real chips.

Note: this machine's sitecustomize registers a remote TPU ("axon") PJRT
plugin and forces ``jax_platforms="axon,cpu"``; tests must run locally on
CPU, so we override both the env var and the live config here.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:  # pragma: no cover - config key should always exist
    pass

# Persistent compilation cache: jit compiles dominate suite wall time, and
# the kernels are identical across runs. ~2x faster repeat runs.
try:
    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/ai_safety_gridworlds_tpu_jax_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:  # pragma: no cover - older jax without the cache keys
    pass

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Parity-oracle checkout of levitation-opensource/ai-safety-gridworlds.
# Lockstep tests skip cleanly when it is absent (e.g. plain CI runners);
# point AI_SAFETY_GRIDWORLDS_REFERENCE at a checkout to enable them.
REFERENCE_ROOT = os.environ.get(
    "AI_SAFETY_GRIDWORLDS_REFERENCE", "/root/reference"
)


def reference_available() -> bool:
    """Whether the reference implementation is importable as a parity oracle."""
    return os.path.isdir(REFERENCE_ROOT)


def add_reference_to_path():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
