"""Worker process for the 2-process multi-host smoke tests.

Each process owns 4 virtual CPU devices; ``jax.distributed.initialize``
joins them into one 8-device cluster (the real path through
``parallel/mesh.py:initialize_distributed`` — single-process tests never
reach it). The global mesh spans both processes, so the learner's pmean
gradient sync actually crosses the process boundary (gloo collectives on
CPU; ICI/DCN on TPU pods).

Covers BOTH production engines (VERDICT-r4 item 6): ``jnp`` (the
shard_map jnp tick) and ``ring`` (the per-shard aliased-obs-ring Pallas
kernel, interpret-mode on CPU) — the process boundary is exactly where
``jax.distributed`` + Pallas interactions can surprise, and the
single-process virtual-mesh suite cannot reach it.

Besides cross-process replicated-param equality, the worker exercises a
mid-run **bitwise save/resume across the process boundary**: after the
first chunk every process writes its addressable shards to disk (the
multi-host checkpoint layout — no process ever sees another's shards),
reconstructs the global carry from the loaded pieces via
``jax.make_array_from_single_device_arrays``, and verifies a second
chunk from the restored carry is bit-identical to continuing from the
live one.

Invoked by tests/test_multihost.py:
    python multihost_worker.py <proc_id> <num_procs> <port> <outdir> <engine>
"""

import hashlib
import json
import os
import pickle
import sys


def _save_local_shards(path: str, tree) -> None:
    """Persist this process's addressable shards of every carry leaf."""
    import jax
    import numpy as np

    leaves = jax.tree.leaves(tree)
    payload = []
    for leaf in leaves:
        payload.append([
            np.asarray(s.data) for s in leaf.addressable_shards])
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def _restore_from_local_shards(path: str, template):
    """Rebuild the global carry from this process's on-disk shards.

    The multi-host resume path: every process loads only its own pieces
    and ``jax.make_array_from_single_device_arrays`` stitches them into
    global arrays with the template's sharding — bitwise, no collectives.
    """
    import jax

    with open(path, "rb") as f:
        payload = pickle.load(f)
    leaves, treedef = jax.tree.flatten(template)
    rebuilt = []
    for leaf, pieces in zip(leaves, payload):
        shards = leaf.addressable_shards
        arrays = [
            jax.device_put(piece, shard.device)
            for piece, shard in zip(pieces, shards)]
        rebuilt.append(jax.make_array_from_single_device_arrays(
            leaf.shape, leaf.sharding, arrays))
    return jax.tree.unflatten(treedef, rebuilt)


def _digest(tree) -> str:
    """sha256 over this process's addressable shards (bitwise)."""
    import jax
    import numpy as np

    digest = hashlib.sha256()
    for leaf in jax.tree.leaves(tree):
        for s in leaf.addressable_shards:
            digest.update(np.ascontiguousarray(np.asarray(s.data)).tobytes())
    return digest.hexdigest()


def main() -> None:
    proc_id, nprocs, port, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4])
    engine = sys.argv[5] if len(sys.argv) > 5 else "jnp"

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

    if engine == "ring":
        # The production Pallas ring engine, interpret-mode on CPU:
        # per-shard aliased obs rings, in-kernel actor, pmean grad sync
        # crossing the real process boundary.
        env_params = EnvParams(grid_size=9, n_drones=4)
        agent = DQN(
            DQNConfig(hidden_layers=(8,), epsilon_decay_every=5,
                      target_update_interval=5),
            env_params)
        mesh = make_env_mesh()
        trainer = DistributedTrainer(
            agent, env_params, mesh, num_envs=8 * 128,
            buffer_capacity_per_shard=2 * 128, batch_size_per_shard=4,
            engine="ring", interpret=True)
        scan_steps = 4
    else:
        env_params = EnvParams(grid_size=8, n_drones=3)
        agent = DQN(
            DQNConfig(hidden_layers=(8,), epsilon_decay_every=5,
                      target_update_interval=5),
            env_params)
        mesh = make_env_mesh()  # all 8 global devices, both processes
        trainer = DistributedTrainer(
            agent, env_params, mesh, num_envs=16,
            buffer_capacity_per_shard=64, batch_size_per_shard=2)
        scan_steps = 6
    carry = trainer.init_carry(jax.random.PRNGKey(0))
    chunk = trainer.build_chunk(scan_steps=scan_steps)
    carry, (rewards, losses) = chunk(carry)
    jax.block_until_ready(carry)

    # --- mid-run bitwise save/resume across the process boundary -------
    ckpt = os.path.join(outdir, f"shards_{engine}_{proc_id}.pkl")
    _save_local_shards(ckpt, carry)
    restored = _restore_from_local_shards(ckpt, carry)
    carry_cont, (rew_cont, _) = chunk(carry)
    carry_res, (rew_res, _) = chunk(restored)
    jax.block_until_ready((carry_cont, carry_res))
    resume_bitwise = (
        _digest(carry_cont) == _digest(carry_res)
        and _digest(rew_cont) == _digest(rew_res))

    # Only addressable shards may be read in multi-process mode. Params
    # are replicated: each process hashes its local view; the parent
    # asserts the hashes agree across processes.
    digest = hashlib.sha256()
    for leaf in jax.tree.leaves(carry_cont[-3].params):
        digest.update(
            np.ascontiguousarray(
                np.asarray(leaf.addressable_shards[0].data)).tobytes())
    epsilon = float(
        np.asarray(carry_cont[-3].epsilon.addressable_shards[0].data))
    step = int(np.asarray(carry_cont[-1].addressable_shards[0].data))
    local_rewards = np.concatenate(
        [np.asarray(s.data) for s in rew_cont.addressable_shards], axis=None)

    with open(os.path.join(outdir, f"result_{engine}_{proc_id}.json"),
              "w") as f:
        json.dump({
            "params_hash": digest.hexdigest(),
            "epsilon": epsilon,
            "step": step,
            "rewards_finite": bool(np.isfinite(local_rewards).all()),
            "resume_bitwise": resume_bitwise,
        }, f)


if __name__ == "__main__":
    main()
