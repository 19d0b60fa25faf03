"""Headline benchmark: fused DQN training throughput (obs/s).

Workload matches the reference README benchmark row "(16,16) dense DQN"
(grid 9, 4 drones, window radius 3, full actor-learner loop: env step +
ε-greedy act + replay write/read + TD update + target sync), measured as
``obs_per_sec = num_envs * num_steps / wall_time`` — the identical metric
definition (reference: train_jax.py:234-236).

Baseline: 3,843 obs/s on TPU v3-8 (reference README.md:78, measured at
num_envs=1). This benchmark runs the same loop at num_envs=65536 on one
chip through the fused-Pallas engine (the entire environment tick — PRNG,
physics, respawns, window observations — is one kernel dispatch; see
dronerl_tpu/ops/fused_tick.py). Scaling throughput with the env batch is
the point of the TPU-native rebuild; the reference README makes the same
argument with its --num_envs plot.

Prints exactly one JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp

from dronerl_tpu.agents.dqn import DQN, DQNConfig
from dronerl_tpu.env.types import EnvParams
from dronerl_tpu.train import (
    build_train_step_ring, init_ring_carry, setup_compilation_cache)

BASELINE_OBS_PER_SEC = 3843.0  # reference TPU v3-8, (16,16) dense
NUM_ENVS = 65536
TIMED_STEPS = 2000
TIMED_REPEATS = 4


def main():
    setup_compilation_cache("/root/repo/.jax_cache_bench")
    env_params = EnvParams(grid_size=9, n_drones=4, window_radius=3)
    config = DQNConfig(
        network_type="dense", hidden_layers=(16, 16),
        epsilon_decay_every=5, target_update_interval=10, gamma=0.9)
    agent = DQN(config, env_params)
    # capacity rounded to the push size → contiguous replay writes
    capacity = max(-(-100_000 // NUM_ENVS) * NUM_ENVS, 2 * NUM_ENVS)

    rng = jax.random.PRNGKey(0)
    tick = build_train_step_ring(
        agent, env_params, NUM_ENVS, capacity, batch_size=8,
        reset_env_every=100)
    # bf16 ring storage (the trainer default): halves the kernel's
    # per-step obs write; env transitions stay bit-exact — the ring only
    # feeds actor/learner matmuls, which round to bf16 on the MXU anyway.
    carry = init_ring_carry(agent, env_params, NUM_ENVS, capacity, rng,
                            obs_dtype=jnp.bfloat16)

    @jax.jit
    def run(carry, dummy):
        return jax.lax.scan(tick, carry, dummy)
    # Warm up with the same scan length so compilation and buffer fill are
    # excluded from the timed region.
    dummy = jnp.zeros((TIMED_STEPS,))
    carry, (rewards, *_aux) = run(carry, dummy)
    float(rewards.sum())  # hard host sync (block_until_ready can lie on
    #                        tunneled backends; a host transfer cannot)

    # Time several back-to-back iterations as one region. The final host
    # read is data-dependent on every iteration through the carry chain,
    # so asynchronous dispatch cannot fake it.
    start = time.perf_counter()
    for _ in range(TIMED_REPEATS):
        carry, (rewards, *_aux) = run(carry, dummy)
    float(rewards.sum())
    elapsed = time.perf_counter() - start

    obs_per_sec = NUM_ENVS * TIMED_STEPS * TIMED_REPEATS / elapsed
    print(json.dumps({
        "metric": "train_obs_per_sec_dense16_65536envs",
        "value": round(obs_per_sec, 1),
        "unit": "obs/s",
        "vs_baseline": round(obs_per_sec / BASELINE_OBS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
