"""Single-chip perf row for BASELINE config 5's per-chip workload.

BASELINE.json configs[4] is the multi-host target: "32k envs sharded over
N>=2 hosts, 16x16 grid, 8 drones". Its 256-cell board exercises the
fused kernel's float two-reduce spawn-picker fallback (boards >128 cells;
ops/fused_tick.py) instead of the integer-composite picker the 9x9
headline uses — so the multi-host projection needs a MEASURED per-chip
number at this shape, not an extrapolation from the 9x9 row (VERDICT r2
item 10).

Measures the full ring-engine training step (env physics + in-kernel
actor + ring replay + TD/Adam) at the per-chip env shares of the
multi-host config (4,096 = 32k/8 chips; 32,768 = whole workload on one
chip). Same robust protocol as bench.py: AOT-ish warmup excluded,
per-repeat host-synced timing, median reported.

Run on the chip: python scripts/config5_bench.py
Frozen record: scripts/config5_results.json; summarized in PERF.md.
"""

import argparse
import json
import os
import statistics
import time

import jax
import jax.numpy as jnp

from dronerl_tpu.agents.dqn import DQN, DQNConfig
from dronerl_tpu.env.types import EnvParams
from dronerl_tpu.train import (
    build_train_step_ring, init_ring_carry, setup_compilation_cache)


def measure(num_envs: int, steps: int, repeats: int, calls: int) -> dict:
    env_params = EnvParams(grid_size=16, n_drones=8, window_radius=3)
    config = DQNConfig(
        network_type="dense", hidden_layers=(16, 16),
        epsilon_decay_every=5, target_update_interval=10, gamma=0.9)
    agent = DQN(config, env_params)
    capacity = max(-(-100_000 // num_envs) * num_envs, 2 * num_envs)
    rng = jax.random.PRNGKey(0)
    tick = build_train_step_ring(
        agent, env_params, num_envs, capacity, batch_size=8,
        reset_env_every=100)
    carry = init_ring_carry(agent, env_params, num_envs, capacity, rng,
                            obs_dtype=jnp.bfloat16)

    @jax.jit
    def run(carry, dummy):
        return jax.lax.scan(tick, carry, dummy)

    dummy = jnp.zeros((steps,))
    t0 = time.perf_counter()
    for _ in range(2):
        carry, (rewards, *_aux) = run(carry, dummy)
    float(rewards.sum())
    warm_s = time.perf_counter() - t0

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(calls):
            carry, (rewards, *_aux) = run(carry, dummy)
        float(rewards.sum())
        times.append(time.perf_counter() - t0)
    med = statistics.median(times)
    return {
        "grid": 16, "n_drones": 8, "num_envs": num_envs,
        "obs_per_sec": round(num_envs * steps * calls / med, 1),
        "warmup_s": round(warm_s, 1),
        "repeat_s": [round(t, 4) for t in times],
    }


def main():
    setup_compilation_cache("/root/repo/jax_cache")
    p = argparse.ArgumentParser()
    p.add_argument("--envs", nargs="+", type=int, default=[4096, 32768])
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--repeats", type=int, default=6)
    p.add_argument("--calls", type=int, default=4)
    args = p.parse_args()

    rows = []
    for num_envs in args.envs:
        row = measure(num_envs, args.steps, args.repeats, args.calls)
        rows.append(row)
        print(json.dumps(row), flush=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "config5_results.json")
    with open(path, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
