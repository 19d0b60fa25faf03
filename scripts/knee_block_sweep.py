"""Directive-5 residency sweep: can any block/VMEM setting recover the
131k knee?

The round-4 knee grid (scripts/knee_experiments.py, PERF.md "The 131k
knee") established the 131,072-env regression (−10% vs 65,536) is a
latency/residency effect, not HBM-bandwidth. This sweep varies the two
residency knobs the kernel exposes — the lane-block cap
(``_FULL_KERNEL_MAX_BLOCK``) and the Mosaic scoped-VMEM budget
(``DRONERL_VMEM_LIMIT_BYTES``) — at 131,072 envs, plus the 65,536
control, and appends rows to scripts/knee_block_results.json.

Run on the chip:
    python scripts/knee_block_sweep.py [--steps 200 --repeats 3]
"""

import argparse
import importlib.util
import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

_spec = importlib.util.spec_from_file_location(
    "knee_experiments", os.path.join(_HERE, "knee_experiments.py"))
knee = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(knee)

# (envs, max_block, vmem_limit_bytes or None=keep default)
POINTS = [
    (131072, 256, None),
    (131072, 512, None),          # the knee baseline
    (131072, 1024, None),
    (131072, 512, 64 * 2**20),
    (131072, 512, 128 * 2**20),
    (131072, 1024, 128 * 2**20),
    (65536, 512, None),           # control
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--calls", type=int, default=1)
    args = p.parse_args()

    out_path = os.path.join(_HERE, "knee_block_results.json")
    rows = []
    if os.path.exists(out_path):
        with open(out_path) as f:
            rows = json.load(f)

    for envs, max_block, vmem in POINTS:
        if vmem is None:
            os.environ.pop("DRONERL_VMEM_LIMIT_BYTES", None)
        else:
            os.environ["DRONERL_VMEM_LIMIT_BYTES"] = str(vmem)
        try:
            r = knee.measure(envs, 3, args.steps, args.repeats, args.calls,
                             max_block=max_block)
        except Exception as e:  # noqa: BLE001 — record the failure row
            r = {"num_envs": envs, "max_block": max_block,
                 "error": f"{type(e).__name__}: {e}"}
        r["vmem_limit_mb"] = (vmem // 2**20) if vmem else "default"
        print(json.dumps(r), flush=True)
        rows.append(r)
        with open(out_path, "w") as f:
            json.dump(rows, f, indent=1)
    os.environ.pop("DRONERL_VMEM_LIMIT_BYTES", None)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
