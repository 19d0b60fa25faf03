"""Mesh/shard_map training tests on the 8-virtual-device CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dronerl_tpu.agents.dqn import DQN, DQNConfig
from dronerl_tpu.env.types import EnvParams
from dronerl_tpu.parallel import DistributedTrainer, make_env_mesh

ENV = EnvParams(grid_size=8, n_drones=3)
CFG = DQNConfig(hidden_layers=(8,), epsilon_decay_every=5,
                target_update_interval=5)


def make_trainer(n_devices=8, num_envs=16):
    agent = DQN(CFG, ENV)
    mesh = make_env_mesh(n_devices)
    trainer = DistributedTrainer(
        agent, ENV, mesh, num_envs=num_envs,
        buffer_capacity_per_shard=64, batch_size_per_shard=2)
    return agent, trainer


def test_init_carry_shardings():
    _, trainer = make_trainer()
    carry = trainer.init_carry(jax.random.PRNGKey(0))
    rng, env_states, obs, ag_state, bstate, step = carry
    assert env_states.ground.shape == (16, 8, 8)
    # env state sharded over 8 devices
    assert len(env_states.ground.sharding.device_set) == 8
    # learner params replicated
    for leaf in jax.tree.leaves(ag_state.params):
        assert leaf.sharding.is_fully_replicated
    # per-shard buffers: global storage = 8 shards × local capacity
    assert bstate.storage["obs"].shape[0] == 8 * 64


def test_chunk_advances_and_keeps_params_in_sync():
    _, trainer = make_trainer()
    carry = trainer.init_carry(jax.random.PRNGKey(0))
    chunk = trainer.build_chunk(scan_steps=12)
    carry, (rewards, losses) = chunk(carry)
    jax.block_until_ready(rewards)
    assert rewards.shape == (12, 16)
    assert losses.shape == (12,)
    assert np.isfinite(np.asarray(losses)).all()
    assert int(carry[-1]) == 12
    ag_state = carry[3]
    # params changed (training happened once buffers warmed)
    assert float(ag_state.epsilon) < 1.0
    # replicated arrays must be identical across devices
    for leaf in jax.tree.leaves(ag_state.params):
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)


def test_env_shards_evolve_independently():
    _, trainer = make_trainer()
    carry = trainer.init_carry(jax.random.PRNGKey(0))
    env_states = carry[1]
    grounds = np.asarray(env_states.ground)
    # different shards got different worlds (per-shard rng folding)
    assert not np.array_equal(grounds[0], grounds[-1])


def test_num_envs_must_divide_devices():
    agent = DQN(CFG, ENV)
    mesh = make_env_mesh(8)
    with pytest.raises(ValueError):
        DistributedTrainer(agent, ENV, mesh, num_envs=12)


def test_mesh_subset():
    # meshes over a strict subset of devices also work (pod-slice subsets)
    _, trainer = make_trainer(n_devices=4, num_envs=8)
    carry = trainer.init_carry(jax.random.PRNGKey(1))
    chunk = trainer.build_chunk(scan_steps=3)
    carry, (rewards, _losses) = chunk(carry)
    assert rewards.shape == (3, 8)


def _run_fused_chunk(agent, env_params, scan_steps=3):
    mesh = make_env_mesh(8)
    trainer = DistributedTrainer(
        agent, env_params, mesh,
        num_envs=8 * 128,
        buffer_capacity_per_shard=4 * 128,
        batch_size_per_shard=4,
        engine="fused",
        interpret=True,
    )
    carry = trainer.init_carry(jax.random.PRNGKey(0))
    chunk = trainer.build_chunk(scan_steps=scan_steps)
    carry, (rewards, losses) = chunk(carry)
    assert rewards.shape == (scan_steps, 8 * 128)
    assert np.isfinite(np.asarray(rewards)).all()
    assert np.isfinite(np.asarray(losses)).all()
    assert int(carry[-1]) == scan_steps
    # params replicated: every shard applied identical psum-synced updates
    leaves = jax.tree.leaves(carry[3].params)
    for leaf in leaves:
        assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.slow
def test_fused_engine_chunk_interpret():
    """Fused Pallas engine under shard_map: envs/replay shard on lanes,
    learner params stay replicated through psum-synced updates."""
    env_params = EnvParams(grid_size=9, n_drones=4)
    agent = DQN(DQNConfig(hidden_layers=(16, 16), epsilon_decay_every=5,
                          target_update_interval=5), env_params)
    _run_fused_chunk(agent, env_params)


@pytest.mark.slow
@pytest.mark.parametrize("conv_matmul", [False, True])
def test_fused_engine_conv_chunk_interpret(conv_matmul):
    """Conv nets under the sharded fused engine: with conv_matmul=False
    the fused env kernel runs per shard with the conv actor in XLA (no
    silent jnp downgrade); with conv_matmul=True the actor runs
    in-kernel via the im2col lowering (ops/conv2mat.py)."""
    env_params = EnvParams(grid_size=9, n_drones=4)
    agent = DQN(
        DQNConfig(
            network_type="conv",
            conv_layers=({"out_channels": 4, "kernel_size": 3,
                          "stride": 1, "padding": 1},),
            conv_dense_layers=(8,),
            conv_matmul=conv_matmul,
            epsilon_decay_every=5,
            target_update_interval=5),
        env_params)
    _run_fused_chunk(agent, env_params)


@pytest.mark.slow
def test_ring_engine_chunk_interpret():
    """Per-shard aliased obs rings under shard_map: each chip's kernel
    reads/writes its own ring; only the pmean grad sync crosses chips."""
    env_params = EnvParams(grid_size=9, n_drones=4)
    agent = DQN(DQNConfig(hidden_layers=(16, 16), epsilon_decay_every=5,
                          target_update_interval=5), env_params)
    mesh = make_env_mesh(8)
    trainer = DistributedTrainer(
        agent, env_params, mesh,
        num_envs=8 * 128,
        buffer_capacity_per_shard=4 * 128,
        batch_size_per_shard=4,
        engine="ring",
        interpret=True,
    )
    carry = trainer.init_carry(jax.random.PRNGKey(0))
    ring = carry[1][1]
    assert ring.dtype == jnp.bfloat16
    assert ring.shape == (agent.obs_dim, 8 * 4 * 128)  # global = 8 shards
    chunk = trainer.build_chunk(scan_steps=3)
    carry, (rewards, losses) = chunk(carry)
    assert rewards.shape == (3, 8 * 128)
    assert np.isfinite(np.asarray(rewards)).all()
    assert int(carry[-1]) == 3
    assert float(carry[-3].epsilon) < 1.0
    # params replicated across shards after psum-synced updates
    for leaf in jax.tree.leaves(carry[-3].params):
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)


@pytest.mark.slow
def test_ring_engine_conv_matmul_chunk_interpret():
    """Sharded ring engine with a CONV actor (im2col lowering,
    conv_matmul=True): each shard's kernel runs the conv net as a dense
    matmul chain; learner stays replicated through the pmean sync."""
    env_params = EnvParams(grid_size=9, n_drones=4)
    agent = DQN(
        DQNConfig(network_type="conv", conv_dense_layers=(16,),
                  conv_matmul=True, epsilon_decay_every=5,
                  target_update_interval=5), env_params)
    assert agent.net_spec is not None
    mesh = make_env_mesh(4)
    trainer = DistributedTrainer(
        agent, env_params, mesh,
        num_envs=4 * 128,
        buffer_capacity_per_shard=4 * 128,
        batch_size_per_shard=4,
        engine="ring",
        interpret=True,
    )
    carry = trainer.init_carry(jax.random.PRNGKey(0))
    chunk = trainer.build_chunk(scan_steps=3)
    carry, (rewards, losses) = chunk(carry)
    assert rewards.shape == (3, 4 * 128)
    assert np.isfinite(np.asarray(rewards)).all()
    assert float(carry[-3].epsilon) < 1.0
    for leaf in jax.tree.leaves(carry[-3].params):
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)


@pytest.mark.slow
def test_ring_engine_hybrid_rng_chunk_interpret():
    """Sharded ring engine in hybrid RNG mode (--fast_rng actor →
    actor_rng_rounds=8): the chunk builds and trains; the kernel-level
    env-transition parity of the hybrid is locked separately in
    tests/test_fused_tick.py::test_full_tick_hybrid_rng_env_parity."""
    env_params = EnvParams(grid_size=9, n_drones=4)
    agent = DQN(DQNConfig(hidden_layers=(16, 16), epsilon_decay_every=5,
                          target_update_interval=5), env_params)
    mesh = make_env_mesh(4)
    trainer = DistributedTrainer(
        agent, env_params, mesh,
        num_envs=4 * 128,
        buffer_capacity_per_shard=4 * 128,
        batch_size_per_shard=4,
        engine="ring",
        interpret=True,
        actor_rng_rounds=8,
    )
    carry = trainer.init_carry(jax.random.PRNGKey(0))
    chunk = trainer.build_chunk(scan_steps=3)
    carry, (rewards, losses) = chunk(carry)
    assert rewards.shape == (3, 4 * 128)
    assert np.isfinite(np.asarray(rewards)).all()
    for leaf in jax.tree.leaves(carry[-3].params):
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)


def test_ring_engine_rejects_conv_and_indivisible_batch():
    env_params = EnvParams(grid_size=9, n_drones=4)
    mesh = make_env_mesh(8)
    conv_agent = DQN(
        DQNConfig(network_type="conv", conv_dense_layers=(8,),
                  epsilon_decay_every=5), env_params)
    with pytest.raises(ValueError, match="dense"):
        DistributedTrainer(conv_agent, env_params, mesh, num_envs=8 * 128,
                           engine="ring")
    dense_agent = DQN(
        DQNConfig(hidden_layers=(8,), epsilon_decay_every=5), env_params)
    # collect_drones > 1 is supported since round 3; only a batch that
    # can't split into per-drone row groups is rejected.
    with pytest.raises(ValueError, match="divisible by"):
        DistributedTrainer(dense_agent, env_params, mesh, num_envs=8 * 128,
                           engine="ring", collect_drones=2,
                           batch_size_per_shard=5)


@pytest.mark.slow
def test_ring_engine_multicollect_chunk_interpret():
    """Sharded ring engine with collect_drones=2: per-shard rings hold
    two transitions per column; learner stays replicated."""
    env_params = EnvParams(grid_size=9, n_drones=4)
    agent = DQN(DQNConfig(hidden_layers=(16, 16), epsilon_decay_every=5,
                          target_update_interval=5), env_params)
    mesh = make_env_mesh(4)
    trainer = DistributedTrainer(
        agent, env_params, mesh,
        num_envs=4 * 128,
        buffer_capacity_per_shard=2 * 2 * 128,
        batch_size_per_shard=4,
        collect_drones=2,
        engine="ring",
        interpret=True,
    )
    carry = trainer.init_carry(jax.random.PRNGKey(0))
    ring = carry[1][1]
    assert ring.shape == (2 * agent.obs_dim, 4 * 2 * 128)
    assert carry[2][0].shape == (2, 4 * 2 * 128)
    chunk = trainer.build_chunk(scan_steps=3)
    carry, (rewards, losses) = chunk(carry)
    assert rewards.shape == (3, 4 * 128)
    assert np.isfinite(np.asarray(rewards)).all()
    for leaf in jax.tree.leaves(carry[-3].params):
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)


# --- HLO collective-pattern guard (VERDICT-r3 item 5) -------------------

_COLLECTIVE_KINDS = ("all_gather", "collective_permute", "all_to_all",
                     "reduce_scatter", "collective_broadcast")


def _all_reduce_shapes(lowered_text):
    """Operand tensor shapes of every stablehlo.all_reduce in a lowered
    module (the op carries a reduction region, so the type signature
    trails the region: `}) : (tensor<...>) -> ...`)."""
    import re

    return sorted(re.findall(
        r'"stablehlo.all_reduce"\(.*?\)\s*:\s*\(tensor<([^>]+)>\)',
        lowered_text, re.S))


def _grad_shape_set(agent):
    """Gradient all-reduce shapes: each param leaf either as-is or with
    a leading broadcast axis (vma-mode autodiff emits bias grads as
    (1, n) out of the flax broadcast backward)."""
    shapes = set()
    st = agent.init_state(jax.random.PRNGKey(0))
    for leaf in jax.tree.leaves(st.params):
        shapes.add(tuple(leaf.shape))
        shapes.add((1,) + tuple(leaf.shape))
    return shapes


def _shape_str_to_tuple(s):
    # "294x8xf32" -> (294, 8); "f32" -> ()
    dims = s.split("x")[:-1]
    return tuple(int(d) for d in dims)


@pytest.mark.parametrize("engine", ["jnp", "fused", "ring"])
def test_chunk_collective_pattern(engine):
    """The sharded chunk's per-step collective set is EXACTLY one
    gradient-sized all-reduce per param leaf plus scalar loss pmeans —
    and zero env-state/ring/obs collectives of any kind. This turns the
    '>80% scaling efficiency' layout argument into a compiled-program
    invariant: env physics, replay traffic and observations must never
    leave their shard (VERDICT-r3 item 5)."""
    env_params = EnvParams(grid_size=9, n_drones=4)
    agent = DQN(DQNConfig(hidden_layers=(16, 16), epsilon_decay_every=5,
                          target_update_interval=5), env_params)
    mesh = make_env_mesh(8)
    kw = {} if engine == "jnp" else {"engine": engine, "interpret": True}
    trainer = DistributedTrainer(
        agent, env_params, mesh,
        num_envs=8 * 128,
        buffer_capacity_per_shard=4 * 128,
        batch_size_per_shard=4,
        **kw,
    )
    carry = trainer.init_carry(jax.random.PRNGKey(0))
    chunk = trainer.build_chunk(scan_steps=4)
    txt = chunk.lower(carry).as_text()

    # No sharded tensor may travel by any non-all-reduce collective.
    for kind in _COLLECTIVE_KINDS:
        assert f"stablehlo.{kind}" not in txt, (
            f"{engine}: unexpected {kind} in the compiled chunk")

    shapes = [_shape_str_to_tuple(s) for s in _all_reduce_shapes(txt)]
    assert shapes, f"{engine}: no gradient all-reduce found at all"
    grad_shapes = _grad_shape_set(agent)
    n_param_leaves = len(jax.tree.leaves(
        agent.init_state(jax.random.PRNGKey(0)).params))

    scalars = [s for s in shapes if s == ()]
    tensors = [s for s in shapes if s != ()]
    # Scalar pmeans: the TD loss (the no-train branch's pmean of the
    # literal sentinel constant-folds away). Bounded, never per-env.
    assert 1 <= len(scalars) <= 2, f"{engine}: scalar pmeans = {scalars}"
    # Exactly ONE all-reduce per gradient leaf — a second round (the
    # round-4 redundant pmean-after-autodiff-psum bug) or a missing one
    # both fail here.
    assert len(tensors) == n_param_leaves, (
        f"{engine}: expected {n_param_leaves} gradient all-reduces, "
        f"got {tensors}")
    for s in tensors:
        assert s in grad_shapes, (
            f"{engine}: all-reduce of non-gradient tensor {s} — an "
            "env-state/ring/obs tensor is crossing shards")
