"""On-chip A/B for hybrid RNG (VERDICT-r3 item 6).

Three ring-engine variants at the flagship workload (65,536 envs,
(16,16) dense, grid 9 × 4 drones, radius 3):

  parity   — rng_rounds=20 everywhere (the shipped default)
  hybrid   — env streams 20-round (bit-exact parity), actor/opponent
             uniform field 8-round (trainer-level noise)
  fast     — rng_rounds=8 everywhere (--fast_rng: trades env parity)

Cost-model context (PERF.md): threefry is ~270 µs of the ~1,200 µs
step, but the actor field is only (N+1)=5 of ~174 hashed rows — the
cell uniforms (162 rows) are env-contractual. So the hybrid's ceiling
is ~2% while --fast_rng's is ~25-30%; this script measures both to pin
the verdict with data.

Run on the chip:  python scripts/hybrid_rng_bench.py
Frozen record: scripts/hybrid_rng_results.json (PERF.md cites it).
"""

import json
import os
import sys

import jax
import jax.numpy as jnp

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

import _timing
from dronerl_tpu.agents.dqn import DQN, DQNConfig
from dronerl_tpu.env.types import EnvParams
from dronerl_tpu.train import (
    build_train_step_ring, init_ring_carry, setup_compilation_cache)

NUM_ENVS = 65536
STEPS = 200
REPEATS = 6
CALLS = 3


def measure(rng_rounds: int, actor_rng_rounds) -> dict:
    env_params = EnvParams(grid_size=9, n_drones=4, window_radius=3)
    config = DQNConfig(
        network_type="dense", hidden_layers=(16, 16),
        epsilon_decay_every=5, target_update_interval=10, gamma=0.9)
    agent = DQN(config, env_params)
    capacity = max(-(-100_000 // NUM_ENVS) * NUM_ENVS, 2 * NUM_ENVS)
    rng = jax.random.PRNGKey(0)

    tick = build_train_step_ring(
        agent, env_params, NUM_ENVS, capacity, batch_size=8,
        reset_env_every=10_000, rng_rounds=rng_rounds,
        actor_rng_rounds=actor_rng_rounds)
    carry = init_ring_carry(agent, env_params, NUM_ENVS, capacity, rng,
                            obs_dtype=jnp.bfloat16, batch_size=8)

    @jax.jit
    def run(carry, dummy):
        return jax.lax.scan(tick, carry, dummy)

    dummy = jnp.zeros((STEPS,))
    median_s, warmup_s, times = _timing.timed_median(
        run, carry, dummy, REPEATS, CALLS)
    step_s = median_s / (STEPS * CALLS)
    return {
        "rng_rounds": rng_rounds,
        "actor_rng_rounds": actor_rng_rounds,
        "obs_per_sec": round(NUM_ENVS / step_s, 1),
        "us_per_step": round(step_s * 1e6, 1),
        "warmup_s": round(warmup_s, 1),
        "repeat_s": [round(t, 4) for t in times],
    }


def main():
    setup_compilation_cache("/root/repo/jax_cache")
    out = []
    for label, rounds, actor in (
            ("parity", 20, None),
            ("hybrid", 20, 8),
            ("fast", 8, None)):
        row = dict(measure(rounds, actor), variant=label)
        print(json.dumps(row), flush=True)
        out.append(row)
    path = os.path.join(_HERE, "hybrid_rng_results.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    base = out[0]["obs_per_sec"]
    for row in out[1:]:
        print(f"{row['variant']}: {row['obs_per_sec'] / base:.3f}x of parity")


if __name__ == "__main__":
    main()
