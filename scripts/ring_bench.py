"""Generic robust ring-engine throughput measurement (any config).

Same protocol as bench.py (warmup excluded, per-repeat host-synced,
median of repeats) but parameterized over network type, grid, drones and
env count — used for the on-chip conv-actor datapoint (BASELINE
configs[2]: conv-Q agent on window obs, 1024+ envs, one chip) and any
ad-hoc shape. Appends rows to scripts/ring_bench_results.json.

Run on the chip, e.g.:
    python scripts/ring_bench.py --network_type conv --conv_matmul \
        --envs 1024 65536
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


def measure(args, num_envs: int) -> dict:
    env_params = EnvParams(grid_size=args.grid_size, n_drones=args.n_drones,
                           window_radius=args.window_radius)
    config = DQNConfig(
        network_type=args.network_type,
        hidden_layers=tuple(args.hidden_layers),
        conv_dense_layers=tuple(args.conv_dense_layers),
        conv_matmul=args.conv_matmul,
        epsilon_decay_every=5, target_update_interval=10, gamma=0.9)
    agent = DQN(config, env_params)
    capacity = max(-(-100_000 // num_envs) * num_envs, 2 * num_envs)
    rng = jax.random.PRNGKey(0)

    tick = build_train_step_ring(
        agent, env_params, num_envs, capacity, batch_size=args.batch_size,
        reset_env_every=100, collect_drones=args.collect_drones,
        interpret=args.interpret)
    carry = init_ring_carry(agent, env_params, num_envs, capacity, rng,
                            obs_dtype=jnp.bfloat16,
                            collect_drones=args.collect_drones,
                            batch_size=args.batch_size)

    @jax.jit
    def run(carry, dummy):
        return jax.lax.scan(tick, carry, dummy)

    dummy = jnp.zeros((args.steps,))
    med, warm_s, times = _timing.timed_median(
        run, carry, dummy, args.repeats, args.calls)
    return {
        "num_envs": num_envs,
        "network_type": args.network_type,
        "conv_matmul": args.conv_matmul,
        "interpret": args.interpret,
        "grid_size": args.grid_size, "n_drones": args.n_drones,
        "window_radius": args.window_radius,
        "collect_drones": args.collect_drones,
        "obs_per_sec": round(
            num_envs * args.steps * args.calls * args.collect_drones / med,
            1),
        "us_per_step": round(1e6 * med / (args.steps * args.calls), 1),
        "warmup_s": round(warm_s, 1),
        "repeat_s": [round(t, 4) for t in times],
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--envs", type=int, nargs="+", default=[65536])
    p.add_argument("--network_type", choices=["dense", "conv"],
                   default="dense")
    p.add_argument("--conv_matmul", action="store_true")
    p.add_argument("--hidden_layers", type=int, nargs="+", default=[16, 16])
    p.add_argument("--conv_dense_layers", type=int, nargs="+", default=[])
    p.add_argument("--grid_size", type=int, default=9)
    p.add_argument("--n_drones", type=int, default=4)
    p.add_argument("--window_radius", type=int, default=3)
    p.add_argument("--collect_drones", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--interpret", action="store_true",
                   help="Pallas interpret mode (CPU smoke test; not a "
                        "perf measurement)")
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--repeats", type=int, default=6)
    p.add_argument("--calls", type=int, default=4)
    args = p.parse_args()

    if args.interpret:
        # CPU smoke test: force the CPU backend before any computation
        # (env vars are overridden by the preregistered TPU plugin).
        jax.config.update("jax_platforms", "cpu")
    setup_compilation_cache("/root/repo/jax_cache")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "ring_bench_results.json")
    for envs in args.envs:
        row = measure(args, envs)
        print(json.dumps(row), flush=True)
        _timing.append_row(path, row)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
