"""Single-chip perf row for BASELINE config 5's shape (VERDICT r2 item 10).

BASELINE.json configs[4] — the multi-host workload — is 32k envs sharded
over N hosts on a 16x16 grid with 8 drones. The multi-host projection in
PERF.md ("Multi-chip expectations") scales a per-chip number, so that
number must be measured, not extrapolated from the 9x9/4-drone flagship:
a 16x16 board has 256 cells, which crosses the fused spawner's
rank-matmul threshold (ops/fused_tick.py: boards >256 cells take the
float composite-argmax path) and doubles the collision-resolver's
pairwise work (8 drones -> 28 pairs vs 6).

Measures the ring engine at 32,768 envs/chip (the configs[4] per-chip
share for an 8-chip host at 4096/chip x 8, and exactly the 32k total on
one chip) with the same robust protocol as bench.py: AOT-warmed, per-
repeat host-synced, median over repeats.

Run on the chip:
    python scripts/config5_bench.py
Appends rows to scripts/config5_results.json; row goes into PERF.md.
"""

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import _timing
from dronerl_tpu.agents.dqn import DQN, DQNConfig
from dronerl_tpu.env.types import EnvParams
from dronerl_tpu.train import (
    build_train_step_ring, init_ring_carry, setup_compilation_cache)


def measure(num_envs: int, grid_size: int, n_drones: int, collect: int,
            steps: int, repeats: int, calls: int) -> dict:
    env_params = EnvParams(grid_size=grid_size, n_drones=n_drones,
                           window_radius=3)
    config = DQNConfig(
        network_type="dense", hidden_layers=(16, 16),
        epsilon_decay_every=5, target_update_interval=10, gamma=0.9)
    agent = DQN(config, env_params)
    capacity = max(-(-100_000 // num_envs) * num_envs, 2 * num_envs)
    rng = jax.random.PRNGKey(0)

    tick = build_train_step_ring(
        agent, env_params, num_envs, capacity, batch_size=8,
        reset_env_every=100, collect_drones=collect)
    carry = init_ring_carry(agent, env_params, num_envs, capacity, rng,
                            obs_dtype=jnp.bfloat16, collect_drones=collect,
                            batch_size=8)

    @jax.jit
    def run(carry, dummy):
        return jax.lax.scan(tick, carry, dummy)

    dummy = jnp.zeros((steps,))
    med, warm_s, times = _timing.timed_median(run, carry, dummy, repeats,
                                              calls)
    # obs/s counts one observation per env-step per collected drone,
    # matching the reference metric (train_jax.py:234-236 counts
    # num_envs * steps with its single collected drone).
    return {
        "num_envs": num_envs, "grid_size": grid_size,
        "n_drones": n_drones, "collect_drones": collect,
        "obs_per_sec": round(num_envs * steps * calls * collect / med, 1),
        "env_steps_per_sec": round(num_envs * steps * calls / med, 1),
        "us_per_step": round(1e6 * med / (steps * calls), 1),
        "warmup_s": round(warm_s, 1),
        "repeat_s": [round(t, 4) for t in times],
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--repeats", type=int, default=6)
    p.add_argument("--calls", type=int, default=4)
    p.add_argument("--envs", type=int, default=32768)
    p.add_argument("--collect", type=int, nargs="+", default=[1, 8],
                   help="collect_drones values to measure")
    args = p.parse_args()

    setup_compilation_cache("/root/repo/jax_cache")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "config5_results.json")
    for collect in args.collect:
        row = measure(args.envs, 16, 8, collect, args.steps, args.repeats,
                      args.calls)
        print(json.dumps(row), flush=True)
        _timing.append_row(path, row)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
