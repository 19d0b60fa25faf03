"""Ring-engine sampling-order experiments on the real chip.

Measures the full training step (ring engine) at several env counts with
the replay gather placed BEFORE vs AFTER the aliased ring kernel, plus a
no-sampling ceiling. Hypothesis (PERF.md "donated buffer tolerates no
second reader"): a post-kernel gather forces XLA to copy the donated
ring every step; moving the gather before the kernel removes the copy.

Prints one JSON line per variant; append output to PERF.md when done.

Usage: python scripts/ring_experiments.py [--envs 65536 131072] [--steps 500]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp

from dronerl_tpu.agents.dqn import DQN, DQNConfig
from dronerl_tpu.env.types import EnvParams
from dronerl_tpu.train import (
    build_train_step_ring, init_ring_carry, setup_compilation_cache)


def measure(num_envs: int, steps: int, repeats: int,
            sample_before: bool, obs_dtype=jnp.float32) -> float:
    env_params = EnvParams(grid_size=9, n_drones=4, window_radius=3)
    config = DQNConfig(
        network_type="dense", hidden_layers=(16, 16),
        epsilon_decay_every=5, target_update_interval=10, gamma=0.9)
    agent = DQN(config, env_params)
    capacity = max(-(-100_000 // num_envs) * num_envs, 2 * num_envs)
    rng = jax.random.PRNGKey(0)
    tick = build_train_step_ring(
        agent, env_params, num_envs, capacity, batch_size=8,
        reset_env_every=100, sample_before_kernel=sample_before)
    carry = init_ring_carry(agent, env_params, num_envs, capacity, rng,
                            obs_dtype=obs_dtype, batch_size=8)

    @jax.jit
    def run(carry, dummy):
        return jax.lax.scan(tick, carry, dummy)

    dummy = jnp.zeros((steps,))
    carry, (rewards, *_aux) = run(carry, dummy)
    float(rewards.sum())  # hard host sync (block_until_ready can lie)
    t0 = time.perf_counter()
    for _ in range(repeats):
        carry, (rewards, *_aux) = run(carry, dummy)
    float(rewards.sum())
    dt = time.perf_counter() - t0
    return num_envs * steps * repeats / dt


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--envs", nargs="+", type=int,
                   default=[32768, 65536, 131072])
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--repeats", type=int, default=4)
    p.add_argument("--sample_before", action="store_true")
    p.add_argument("--dtypes", nargs="+", default=["float32", "bfloat16"])
    args = p.parse_args()

    setup_compilation_cache("/root/repo/.jax_cache_bench")
    for num_envs in args.envs:
        for dtype_name in args.dtypes:
            obs_s = measure(num_envs, args.steps, args.repeats,
                            args.sample_before, jnp.dtype(dtype_name))
            print(json.dumps({
                "num_envs": num_envs,
                "sample_before_kernel": args.sample_before,
                "obs_dtype": dtype_name,
                "obs_per_sec": round(obs_s, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
