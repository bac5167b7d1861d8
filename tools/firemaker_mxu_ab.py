"""On-chip A/B: firemaker separable-roll stencil vs MXU log-survival matmul.

Decided VERDICT-r4 item 5 (r5 result in docs/KERNELS.md): the r4 roofline
found the spread stencil's 8 sublane rolls dominate its ~33% share of step
time; the banded [HW, HW] split-W log-survival matmul replaced them and
became the kernel default. This tool re-measures both variants with
``bench.bench_fused`` — the SAME honest host-fetch timing discipline as
the headline config — each at its own ``DEFAULT_TILE`` optimum (rolls:
128, MXU: 256) unless ``--tile`` pins one, and prints one JSON line per
variant. Run on TPU (plain env, axon backend) from the repo root:

    PYTHONPATH=/root/repo python tools/firemaker_mxu_ab.py [--batch 4096]
"""

import argparse
import json

from bench import bench_fused
from ai_safety_gridworlds_tpu.envs.firemaker_ex_ma import FiremakerExMa
from ai_safety_gridworlds_tpu.ops.fused_firemaker import FusedFiremaker


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--tile", type=int, default=None,
                    help="pin one lane tile (default: each variant's "
                         "DEFAULT_TILE optimum)")
    args = ap.parse_args()

    env = FiremakerExMa()
    for name, mxu in (("rolls", False), ("mxu", True)):
        fused = FusedFiremaker(env, mxu_stencil=mxu)
        out = bench_fused(
            fused, n_steps=args.steps, n_reps=args.reps,
            tile=args.tile, batch=args.batch,
        )
        out["variant"] = name
        out["tile"] = args.tile or fused.DEFAULT_TILE
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
