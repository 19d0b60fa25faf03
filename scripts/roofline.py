"""Roofline / MFU accounting for the flagship fused-ring workload.

VERDICT-r3 item 4: the cost model in PERF.md was µs-per-stage only; a
"14,000× vs baseline" number says nothing about what fraction of the
chip the workload can even use. This script derives, from the real
shapes and dtypes, the per-step FLOPs and HBM bytes of the fused ring
engine (bench.py's exact workload: grid 9, 4 drones, radius 3,
65,536 envs, batch 8) for both published nets, and compares them
against TPU v5e (v5litepod) chip peaks:

  - MXU peak: 197 TFLOP/s bf16 (f32 operands are rounded to bf16 on
    the MXU, so this is the relevant ceiling for the actor matmuls)
  - HBM bandwidth: 819 GB/s
  - VPU: the elementwise/PRNG engine; no single public FLOP/s peak is
    quoted per-op-mix, so the table reports the residual step time that
    must be VPU work rather than a utilization percentage.

Measured µs/step comes from frozen on-chip records (knee grid for the
(16,16) net) or --us_per_step overrides (fill the (128,64) cell from a
bench.py run: elapsed_s_per_repeat / (TIMED_STEPS * CALLS)).

Run:  python scripts/roofline.py [--us_per_step_16 N] [--us_per_step_128 N]
Output is the PERF.md "Roofline / MFU accounting" table.
"""

import argparse
import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

# TPU v5e single-chip peaks (public: cloud.google.com/tpu/docs/v5e).
V5E_MXU_BF16_FLOPS = 197e12
V5E_HBM_GBPS = 819e9

NUM_ENVS = 65536
BATCH_SIZE = 8
NB_RING_COLUMNS = 2  # init_ring_carry: capacity = 2 env-batches


def workload_model(hidden_layers):
    """Analytic per-step FLOPs and HBM bytes for the fused ring engine.

    Shapes/dtypes mirror dronerl_tpu/ops/fused_tick.py and
    dronerl_tpu/env/types.py (SoA leaves); counts are per TRAIN STEP at
    NUM_ENVS envs. Uniform generation (threefry) is in-kernel compute
    with zero HBM traffic, which is exactly why it dominates time but
    not this table.
    """
    from dronerl_tpu.agents.dqn import DQN, DQNConfig
    from dronerl_tpu.env.types import EnvParams

    params = EnvParams(grid_size=9, n_drones=4, window_radius=3)
    agent = DQN(DQNConfig(network_type="dense",
                          hidden_layers=tuple(hidden_layers)), params)
    obs_dim = agent.obs_dim
    e, n, g = NUM_ENVS, params.n_drones, params.grid_size

    # --- FLOPs ---------------------------------------------------------
    dims = (obs_dim,) + tuple(hidden_layers) + (5,)
    fwd_flops_per_row = 2 * sum(a * b for a, b in zip(dims, dims[1:]))
    actor_flops = e * fwd_flops_per_row
    # TD update: online fwd + target fwd + backward (~2x fwd) on the
    # sampled batch — 4x a forward pass, negligible next to the actor.
    learner_flops = 4 * BATCH_SIZE * fwd_flops_per_row
    total_flops = actor_flops + learner_flops

    # --- HBM bytes ------------------------------------------------------
    # Ring: the kernel reads this tick's obs column (written last tick)
    # and writes the next one — 1 read + 1 write of (obs_dim, E) bf16.
    ring_bytes = 2 * e * obs_dim * 2
    # SoA env state, feature-major: ground int8 (G*G,E) + air_x/air_y
    # int32 (N,E) + carrying bool (N,E) + charge f32 (N,E); read + write.
    state_per_env = g * g * 1 + n * 4 * 2 + n * 1 + n * 4
    state_bytes = 2 * e * state_per_env
    # Scalar rings + per-step outputs: actions i32 + rewards f32 +
    # dones i8 for the learner slot (write), rewards (E,N) f32 out.
    scalar_bytes = e * (4 + 4 + 1) + e * n * 4
    # Actor weights re-fetched per Mosaic grid step (block = 512 lanes).
    param_bytes = sum(a * b + b for a, b in zip(dims, dims[1:])) * 4
    grid_steps = e // 512
    weight_bytes = param_bytes * grid_steps
    # Learner XLA tail: params + grads + Adam moments r/w (3 tensors
    # read, 2 written, f32) + tiny batch gather.
    learner_bytes = 5 * param_bytes + 4 * BATCH_SIZE * obs_dim * 2 * 2
    total_bytes = (ring_bytes + state_bytes + scalar_bytes
                   + weight_bytes + learner_bytes)
    return {
        "obs_dim": obs_dim,
        "flops": total_flops,
        "bytes": total_bytes,
        "flops_per_byte": total_flops / total_bytes,
        "breakdown_bytes": {
            "obs_ring_rw": ring_bytes,
            "env_state_rw": state_bytes,
            "scalar_rings": scalar_bytes,
            "actor_weights_refetch": weight_bytes,
            "learner_tail": learner_bytes,
        },
    }


def roofline_row(name, hidden_layers, us_per_step):
    m = workload_model(hidden_layers)
    step_s = us_per_step * 1e-6
    mxu_floor_us = m["flops"] / V5E_MXU_BF16_FLOPS * 1e6
    hbm_floor_us = m["bytes"] / V5E_HBM_GBPS * 1e6
    return {
        "net": name,
        "us_per_step": us_per_step,
        "obs_per_sec": NUM_ENVS / step_s,
        "gflops_per_step": m["flops"] / 1e9,
        "mb_per_step": m["bytes"] / 1e6,
        "flops_per_byte": round(m["flops_per_byte"], 2),
        "mfu_pct": round(100 * m["flops"] / step_s / V5E_MXU_BF16_FLOPS, 3),
        "hbm_pct": round(100 * m["bytes"] / step_s / V5E_HBM_GBPS, 1),
        "mxu_floor_us": round(mxu_floor_us, 1),
        "hbm_floor_us": round(hbm_floor_us, 1),
        "light_speed_floor_us": round(max(mxu_floor_us, hbm_floor_us), 1),
        "bytes_breakdown": m["breakdown_bytes"],
    }


def main():
    ap = argparse.ArgumentParser()
    # (16,16) default: the frozen knee-grid point (65k, radius 3,
    # scripts/knee_results.json: 1200.3 µs/step).
    ap.add_argument("--us_per_step_16", type=float, default=None)
    ap.add_argument("--us_per_step_128", type=float, default=None)
    args = ap.parse_args()

    us16 = args.us_per_step_16
    if us16 is None:
        with open(os.path.join(_HERE, "knee_results.json")) as f:
            grid = json.load(f)
        us16 = next(r["us_per_step"] for r in grid
                    if r["num_envs"] == NUM_ENVS
                    and r["window_radius"] == 3
                    and r["max_block"] == 512)
    rows = [roofline_row("dense(16,16)", (16, 16), us16)]
    if args.us_per_step_128 is not None:
        rows.append(roofline_row("dense(128,64)", (128, 64),
                                 args.us_per_step_128))
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
