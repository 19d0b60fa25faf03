"""Scaling-efficiency benchmark: fused training throughput vs device count.

Measures env-steps/s of the shard_map distributed trainer on meshes of
1, 2, 4, ... devices with a fixed per-device env batch (weak scaling).
Efficiency(N) = throughput(N) / (N × throughput(1)).

On a TPU slice this measures real ICI scaling (each mesh device is a real
chip). With --force_cpu N the same program runs on N *virtual* devices
that share one physical CPU — correctness is exercised but the efficiency
number is meaningless there (total compute capacity does not grow with N,
so weak-scaling efficiency trends toward 1/N by construction). For
multi-host runs, start one process per host with
dronerl_tpu.parallel.initialize_distributed().

Run: PYTHONPATH=. python scripts/scaling_bench.py [--force_cpu 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--force_cpu", type=int, default=0,
                        help="use N virtual CPU devices instead of TPU")
    parser.add_argument("--envs_per_device", type=int, default=256)
    parser.add_argument("--steps", type=int, default=200)
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--engine", choices=["auto", "fused", "jnp"],
                        default="auto")
    args = parser.parse_args()

    import jax

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.force_cpu)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    import jax.numpy as jnp

    from dronerl_tpu.agents.dqn import DQN, DQNConfig
    from dronerl_tpu.env.types import EnvParams
    from dronerl_tpu.parallel import DistributedTrainer, make_env_mesh

    env_params = EnvParams(grid_size=9, n_drones=4)
    config = DQNConfig(hidden_layers=(16, 16), epsilon_decay_every=5,
                       target_update_interval=10)

    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    if args.engine == "auto":
        engine = "fused" if (on_tpu and args.envs_per_device >= 128) else "jnp"
    else:
        engine = args.engine

    total = jax.device_count()
    device_counts = [n for n in (1, 2, 4, 8, 16, 32, 64) if n <= total]
    results = []
    base = None
    for ndev in device_counts:
        agent = DQN(config, env_params)
        mesh = make_env_mesh(ndev)
        trainer = DistributedTrainer(
            agent, env_params, mesh,
            num_envs=args.envs_per_device * ndev,
            buffer_capacity_per_shard=args.envs_per_device * 40,
            batch_size_per_shard=8,
            engine=engine,
            interpret=engine == "fused" and not on_tpu,
        )
        carry = trainer.init_carry(jax.random.PRNGKey(0))
        chunk = trainer.build_chunk(args.steps)
        carry, (rewards, _losses) = chunk(carry)  # compile + warm
        float(jnp.sum(rewards))        # hard sync
        t0 = time.perf_counter()
        for _ in range(args.repeats):
            carry, (rewards, _losses) = chunk(carry)
        float(jnp.sum(rewards))
        dt = time.perf_counter() - t0
        obs_per_s = args.envs_per_device * ndev * args.steps * args.repeats / dt
        if base is None:
            base = obs_per_s
        eff = obs_per_s / (base * ndev)
        results.append({"devices": ndev, "obs_per_s": round(obs_per_s),
                        "weak_scaling_efficiency": round(eff, 3)})
        print(json.dumps(results[-1]), flush=True)

    print(json.dumps({"scaling": results}))


if __name__ == "__main__":
    main()
