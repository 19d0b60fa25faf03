"""Worker process for the 2-process multi-host smoke test.

Each process owns 4 virtual CPU devices; ``jax.distributed.initialize``
joins them into one 8-device cluster (the real path through
``parallel/mesh.py:initialize_distributed`` — single-process tests never
reach it). The global mesh spans both processes, so the learner's pmean
gradient sync actually crosses the process boundary (gloo collectives on
CPU; ICI/DCN on TPU pods).

Invoked by tests/test_multihost.py:
    python multihost_worker.py <proc_id> <num_procs> <port> <outdir>
"""

import hashlib
import json
import os
import sys


def main() -> None:
    proc_id, nprocs, port, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4])

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    import numpy as np

    from dronerl_tpu.agents.dqn import DQN, DQNConfig
    from dronerl_tpu.env.types import EnvParams
    from dronerl_tpu.parallel import (
        DistributedTrainer, initialize_distributed, make_env_mesh)

    initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs,
        process_id=proc_id,
    )
    assert jax.process_count() == nprocs
    assert jax.local_device_count() == 4
    assert jax.device_count() == 4 * nprocs

    env_params = EnvParams(grid_size=8, n_drones=3)
    agent = DQN(
        DQNConfig(hidden_layers=(8,), epsilon_decay_every=5,
                  target_update_interval=5),
        env_params)
    mesh = make_env_mesh()  # all 8 global devices, both processes
    trainer = DistributedTrainer(
        agent, env_params, mesh, num_envs=16,
        buffer_capacity_per_shard=64, batch_size_per_shard=2)
    carry = trainer.init_carry(jax.random.PRNGKey(0))
    chunk = trainer.build_chunk(scan_steps=12)
    carry, (rewards, losses) = chunk(carry)
    jax.block_until_ready(rewards)

    # Only addressable shards may be read in multi-process mode. Params
    # are replicated: each process hashes its local view; the parent
    # asserts the hashes agree across processes.
    digest = hashlib.sha256()
    for leaf in jax.tree.leaves(carry[-3].params):
        digest.update(
            np.ascontiguousarray(
                np.asarray(leaf.addressable_shards[0].data)).tobytes())
    epsilon = float(np.asarray(carry[-3].epsilon.addressable_shards[0].data))
    step = int(np.asarray(carry[-1].addressable_shards[0].data))
    local_rewards = np.concatenate(
        [np.asarray(s.data) for s in rewards.addressable_shards], axis=None)

    with open(os.path.join(outdir, f"result_{proc_id}.json"), "w") as f:
        json.dump({
            "params_hash": digest.hexdigest(),
            "epsilon": epsilon,
            "step": step,
            "rewards_finite": bool(np.isfinite(local_rewards).all()),
        }, f)


if __name__ == "__main__":
    main()
