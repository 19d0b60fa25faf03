"""Explicitly sharded training via ``shard_map`` over a device mesh.

Layout (the scaling-book recipe — pick a mesh, place shardings, let XLA
insert collectives):

* **envs, observations, per-step rewards**: sharded along the ``dp`` axis —
  each chip owns ``num_envs / num_devices`` worlds and steps them locally,
  zero communication.
* **replay buffer storage**: sharded along ``dp`` — each chip keeps a
  private ring fed by its local envs and samples its local batch. The
  cursor/size scalars advance identically everywhere, so they stay
  replicated.
* **learner (params / target / Adam state / ε)**: replicated. Each chip
  computes gradients on its local sample; one ``psum`` (pmean) per train
  step synchronizes them over ICI, after which every chip applies an
  identical update.

The same program runs multi-host: call
:func:`dronerl_tpu.parallel.mesh.initialize_distributed` first and build
the mesh over all global devices; env shards then live host-local and the
gradient all-reduce spans ICI/DCN. Per-shard PRNG streams derive from
``fold_in(key, axis_index)`` so trajectories are independent across chips
yet fully deterministic.

This replaces the reference's implicit-GSPMD single-host path
(reference: train_jax.py:196-212) with an explicit, multi-host-capable
design.
"""

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from dronerl_tpu import replay
from dronerl_tpu.agents.dqn import DQN
from dronerl_tpu.constants import NO_TRAIN_LOSS, NUM_ACTIONS
from dronerl_tpu.env import core as env_core
from dronerl_tpu.env.types import EnvParams


def ensure_varying(tree: Any, axis: str) -> Any:
    """Promote constant leaves to 'varying over axis' for vma typing.

    Inside ``shard_map``, values that don't depend on per-shard data (e.g.
    the constant 100.0 charge of a freshly reset env) type as replicated;
    ``lax.cond`` then rejects branches mixing them with sharded values.
    """

    def fix(x):
        if axis not in jax.typeof(x).vma:
            pcast = getattr(jax.lax, "pcast", None)
            if pcast is not None:
                return pcast(x, (axis,), to="varying")
            return jax.lax.pvary(x, (axis,))
        return x

    return jax.tree.map(fix, tree)


class DistributedTrainer:
    """Builds jitted, mesh-sharded init and scan-chunk programs."""

    def __init__(
        self,
        agent: DQN,
        env_params: EnvParams,
        mesh: Mesh,
        num_envs: int,
        buffer_capacity_per_shard: int = 10_000,
        batch_size_per_shard: int = 8,
        collect_drones: int = 1,
        reset_env_every: int = 100,
        axis_name: str = "dp",
        engine: str = "jnp",
        interpret: bool = False,
        rng_rounds: int = 20,
        actor_rng_rounds=None,
    ):
        self.agent = agent
        self.env_params = env_params
        self.mesh = mesh
        self.axis = axis_name
        self.num_devices = mesh.devices.size
        if num_envs % self.num_devices:
            raise ValueError(
                f"num_envs ({num_envs}) must divide over {self.num_devices} devices")
        if engine not in ("jnp", "fused", "ring"):
            raise ValueError(f"unknown engine {engine!r}")
        self.engine = engine
        self.interpret = interpret
        self.rng_rounds = rng_rounds
        # Hybrid RNG (--fast_rng actor): only the in-kernel ε-greedy
        # actor rows run reduced-round threefry; env transitions stay
        # bit-parity (see train.rng_rounds_from_args).
        self.actor_rng_rounds = actor_rng_rounds
        self.num_envs = num_envs
        self.envs_per_shard = num_envs // self.num_devices
        self.collect_drones = collect_drones
        self.reset_env_every = reset_env_every
        # Round the shard capacity up to the per-step push size so writes
        # hit the contiguous fast path (see replay.push_many).
        push = self.envs_per_shard * collect_drones
        capacity = -(-buffer_capacity_per_shard // push) * push

        agent_spec = jax.tree.map(lambda _: P(), self._agent_template())
        if engine == "ring":
            # Per-shard aliased obs ring (the fastest single-chip engine,
            # train.build_train_step_ring, replicated per chip): each
            # shard's kernel reads/writes observations in its own ring
            # slice; only the pmean gradient sync crosses chips.
            if batch_size_per_shard % collect_drones != 0:
                raise ValueError(
                    "ring engine needs batch_size_per_shard divisible by "
                    "collect_drones (per-drone row-group sampling)")
            if agent.config.network_type != "dense" and (
                    agent.net_spec is None):
                raise ValueError(
                    "ring engine runs the actor in-kernel: dense nets, or "
                    "conv nets with conv_matmul=True (--conv_matmul)")
            from dronerl_tpu.ops import fused_tick

            eps = self.envs_per_shard
            # Ring COLUMNS per shard (each column holds collect_drones
            # transitions as stacked row groups — see
            # train.build_train_step_ring).
            self.ring_capacity = max(
                -(-buffer_capacity_per_shard
                  // (eps * collect_drones)) * eps, 2 * eps)
            self.batch_size = batch_size_per_shard
            tstate_spec = fused_tick.TState(
                ground=P(None, self.axis), air_x=P(None, self.axis),
                air_y=P(None, self.axis), carrying=P(None, self.axis),
                charge=P(None, self.axis))
            scalar_spec = (P(self.axis) if collect_drones == 1
                           else P(None, self.axis))
            self.carry_specs = (
                P(),                                   # host rng
                (tstate_spec, P(None, self.axis)),     # env state + obs ring
                (scalar_spec, scalar_spec, scalar_spec),  # scalar rings
                agent_spec,                            # replicated learner
                (),                                    # (trainer convention)
                P(),                                   # step counter
            )
        elif engine == "fused":
            # Feature-major everything: lanes (the LAST axis) shard over dp.
            self.buffer = replay.StreamReplay(
                capacity=max(capacity, 2 * push),
                batch_size=batch_size_per_shard, stride=push)
            bstate_spec = replay.ReplayState(
                storage={
                    "obs": P(None, self.axis),
                    "actions": P(self.axis),
                    "rewards": P(self.axis),
                    "dones": P(self.axis),
                },
                cursor=P(),
                size=P(),
            )
            from dronerl_tpu.ops import fused_tick

            tstate_spec = fused_tick.TState(
                ground=P(None, self.axis), air_x=P(None, self.axis),
                air_y=P(None, self.axis), carrying=P(None, self.axis),
                charge=P(None, self.axis))
            self.carry_specs = (
                P(),                 # host rng
                tstate_spec,         # transposed env state, lanes sharded
                P(None, self.axis),  # learner observations (D, E)
                agent_spec,          # replicated learner
                bstate_spec,
                P(),                 # step counter
            )
        else:
            self.buffer = replay.ReplayBuffer(
                capacity=capacity,
                batch_size=batch_size_per_shard,
                uniform_pushes=True)
            env_spec = jax.tree.map(
                lambda _: P(self.axis), self._env_template())
            bstate_spec = replay.ReplayState(
                storage=jax.tree.map(
                    lambda _: P(self.axis), self._buffer_template()),
                cursor=P(),
                size=P(),
            )
            self.carry_specs = (
                P(),          # host rng (shards fold in their index)
                env_spec,     # env states sharded over dp
                P(self.axis),  # learner observations sharded over dp
                agent_spec,   # replicated
                bstate_spec,
                P(),          # step counter
            )

    # --- templates used only to derive pytree structure for specs -------

    def _env_template(self):
        from dronerl_tpu.env.types import empty_state

        return jax.eval_shape(lambda: empty_state(self.env_params))

    def _buffer_template(self):
        obs_dim = self.agent.obs_dim
        template = {
            "obs": jnp.zeros((obs_dim,), jnp.float32),
            "actions": jnp.array(0, jnp.int32),
            "rewards": jnp.array(0.0, jnp.float32),
            "next_obs": jnp.zeros((obs_dim,), jnp.float32),
            "dones": jnp.array(False, jnp.bool_),
        }
        return jax.eval_shape(
            lambda: replay.init(template, self.buffer.capacity)).storage

    def _agent_template(self):
        return jax.eval_shape(
            lambda: self.agent.init_state(jax.random.PRNGKey(0)))

    # --- programs --------------------------------------------------------

    def init_carry(self, rng: jax.Array, obs_dtype=jnp.bfloat16):
        """Sharded initial carry: each chip resets and owns its env shard.

        ``obs_dtype`` applies to the ring engine's observation storage
        only (see train.init_ring_carry).
        """
        agent = self.agent
        env_params = self.env_params
        envs_per_shard = self.envs_per_shard
        k = self.collect_drones
        axis = self.axis
        engine = self.engine
        if engine != "jnp":
            from dronerl_tpu.ops import fused_tick
        if engine == "ring":
            ring_capacity = self.ring_capacity
        else:
            buffer = self.buffer

        @partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(P(),),
            out_specs=self.carry_specs,
        )
        def _init(rng):
            shard_rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
            env_states = env_core.reset_batch(
                shard_rng, env_params, envs_per_shard)
            obs = env_core.observe_batch(env_states, env_params, k)
            ag_state = agent.init_state(rng)  # replicated: same key everywhere
            template = {
                "obs": jnp.zeros((agent.obs_dim,), jnp.float32),
                "actions": jnp.array(0, jnp.int32),
                "rewards": jnp.array(0.0, jnp.float32),
                "dones": jnp.array(False, jnp.bool_),
            }
            if engine == "ring":
                tstate = fused_tick.to_tstate(env_states)
                obs0 = obs.reshape(envs_per_shard, k * agent.obs_dim).T
                ring = jnp.zeros(
                    (k * agent.obs_dim, ring_capacity), obs_dtype)
                ring = jax.lax.dynamic_update_slice(
                    ring, obs0.astype(obs_dtype), (0, 0))
                scalar_shape = ((ring_capacity,) if k == 1
                                else (k, ring_capacity))
                rings = (
                    jnp.zeros(scalar_shape, jnp.int32),
                    jnp.zeros(scalar_shape, jnp.float32),
                    jnp.zeros(scalar_shape, jnp.int8),
                )
                return (rng, (tstate, ring), rings, ag_state, (),
                        jnp.array(0))
            if engine == "fused":
                bstate = buffer.init(template)
                tstate = fused_tick.to_tstate(env_states)
                obs_t = obs.reshape(envs_per_shard, k * agent.obs_dim).T
                return rng, tstate, obs_t, ag_state, bstate, jnp.array(0)
            bstate = buffer.init(dict(
                template,
                next_obs=jnp.zeros((agent.obs_dim,), jnp.float32)))
            obs = obs.reshape(envs_per_shard, k, agent.obs_dim)
            return rng, env_states, obs, ag_state, bstate, jnp.array(0)

        return jax.jit(_init)(rng)

    def _build_fused_tick(self):
        from dronerl_tpu.ops import fused_tick

        agent = self.agent
        buffer = self.buffer
        env_params = self.env_params
        envs_per_shard = self.envs_per_shard
        k = self.collect_drones
        reset_env_every = self.reset_env_every
        axis = self.axis
        interpret = self.interpret
        obs_dim = agent.obs_dim

        # In-kernel actor coverage: dense natively; conv via the im2col
        # lowering (conv_matmul=True, ops/conv2mat.py).
        dense = (agent.config.network_type == "dense"
                 or agent.net_spec is not None)
        rng_rounds = self.rng_rounds
        actor_rng_rounds = self.actor_rng_rounds

        def tick(carry, _):
            rng, tstate, obs_t, ag_state, bstate, step = carry
            local = jax.random.fold_in(rng, jax.lax.axis_index(axis))
            local = jax.random.fold_in(local, step)
            step_key, sample_key, rand_key, act_key, reset_key = (
                jax.random.split(local, 5))

            if dense:
                # The all-in-one kernel: actor, opponents, physics, obs
                # AND the periodic reset per shard — one dispatch.
                tstate, rewards_t, dones_t, actions_t, next_obs_t = (
                    fused_tick.full_tick_fused(
                        step_key, tstate, obs_t, ag_state.params,
                        ag_state.epsilon, step % reset_env_every == 0,
                        env_params, k, interpret, vma=(axis,),
                        rng_rounds=rng_rounds, net_spec=agent.net_spec,
                        actor_rng_rounds=actor_rng_rounds))
            else:
                # Conv nets: fused env kernel with the actor in XLA (the
                # same composition as the single-chip fused path — the
                # conv forward falls back to the row-major module behind
                # transposes, see DQN.q_values_t).
                actions_t = jax.random.randint(
                    rand_key, (env_params.n_drones, envs_per_shard),
                    0, NUM_ACTIONS)
                dqn_actions = agent.act_t(act_key, obs_t[:obs_dim], ag_state)
                actions_t = actions_t.at[0].set(dqn_actions)
                tstate, rewards_t, dones_t, next_obs_t = (
                    fused_tick.tick_fused(
                        step_key, tstate, actions_t, env_params, k,
                        interpret, vma=(axis,), rng_rounds=rng_rounds))

                def fresh(rkey):
                    states = env_core.reset_batch(
                        rkey, env_params, envs_per_shard)
                    obs = env_core.observe_batch(states, env_params, k)
                    return (fused_tick.to_tstate(states),
                            obs.reshape(envs_per_shard, k * obs_dim).T)

                tstate, next_obs_t = jax.lax.cond(
                    step % reset_env_every == 0,
                    fresh, lambda _: (tstate, next_obs_t), reset_key)

            exps = {
                "obs": jnp.concatenate(
                    [obs_t[i * obs_dim : (i + 1) * obs_dim]
                     for i in range(k)], axis=1) if k > 1 else obs_t,
                "actions": actions_t[:k].reshape(-1),
                "rewards": rewards_t[:k].reshape(-1),
                "dones": dones_t[:k].reshape(-1),
            }
            bstate = buffer.push_many(bstate, exps)

            # Sample outside the cond (no big captured operands).
            batch = buffer.sample(sample_key, bstate)
            batch = dict(batch, dones=batch["dones"].astype(jnp.float32))

            def do_train(operand):
                ag, b = operand
                return agent.train_step_t(ag, b, axis_name=axis)

            def no_train(operand):
                zero = jax.lax.pmean(NO_TRAIN_LOSS, axis)
                return operand[0], zero

            ag_state, loss = jax.lax.cond(
                buffer.can_sample(bstate),
                do_train, no_train,
                (ag_state, batch))

            ag_state = agent.apply_schedules(
                ag_state, step, jnp.array(False))

            rng = jax.random.fold_in(rng, 1)
            carry = (rng, tstate, next_obs_t, ag_state, bstate, step + 1)
            return carry, (rewards_t[0], loss)

        return tick

    def _build_ring_tick(self):
        """Per-shard ring tick (train.build_train_step_ring semantics,
        sample-after order) with pmean-synced learner updates."""
        from dronerl_tpu.ops import fused_tick

        agent = self.agent
        env_params = self.env_params
        eps = self.envs_per_shard
        capacity = self.ring_capacity
        batch_size = self.batch_size
        reset_env_every = self.reset_env_every
        axis = self.axis
        interpret = self.interpret
        rng_rounds = self.rng_rounds
        actor_rng_rounds = self.actor_rng_rounds
        nb = capacity // eps
        k = self.collect_drones
        obs_dim = agent.obs_dim

        def tick(carry, _):
            rng, (tstate, ring), (a_ring, r_ring, d_ring), ag_state, _u, \
                step = carry
            local = jax.random.fold_in(rng, jax.lax.axis_index(axis))
            local = jax.random.fold_in(local, step)
            step_key, sample_key = jax.random.split(local, 2)

            read_slot = (step % nb) * eps
            write_slot = ((step + 1) % nb) * eps
            tstate, rewards_t, dones_t, actions_t, ring = (
                fused_tick.full_tick_fused_ring(
                    step_key, tstate, ring, read_slot, write_slot,
                    ag_state.params, ag_state.epsilon,
                    step % reset_env_every == 0, env_params, k, interpret,
                    rng_rounds=rng_rounds, net_spec=agent.net_spec,
                    actor_rng_rounds=actor_rng_rounds))

            a_ring, r_ring, d_ring = fused_tick.ring_scalar_writes(
                a_ring, r_ring, d_ring, actions_t, rewards_t, dones_t,
                read_slot, k)

            # Complete tuples after tick t: steps [max(0, t+2-nb), t] —
            # identical slot arithmetic to the single-chip ring engine
            # (the shared helpers keep the two from diverging).
            valid = jnp.minimum(step + 1, nb - 1) * eps
            base_step = jnp.maximum(0, step + 2 - nb)
            batch = fused_tick.ring_gather_batch(
                sample_key, ring, a_ring, r_ring, d_ring, valid, base_step,
                num_envs=eps, capacity=capacity, batch_size=batch_size,
                collect=k, obs_dim=obs_dim)

            def do_train(op):
                return agent.train_step_t(op[0], op[1], axis_name=axis)

            def no_train(op):
                return op[0], jax.lax.pmean(NO_TRAIN_LOSS, axis)

            ag_state, loss = jax.lax.cond(
                valid >= batch_size // k, do_train, no_train,
                (ag_state, batch))
            ag_state = agent.apply_schedules(
                ag_state, step, jnp.array(False))

            rng = jax.random.fold_in(rng, 1)
            carry = (rng, (tstate, ring), (a_ring, r_ring, d_ring),
                     ag_state, (), step + 1)
            return carry, (rewards_t[0], loss)

        return tick

    def build_chunk(self, scan_steps: int):
        """Jitted program running ``scan_steps`` fused train ticks.

        Outputs per step: drone-0 rewards (sharded over envs) and the
        pmean'd TD loss (replicated) — surfaced for training curves.
        """
        if self.engine in ("fused", "ring"):
            tick = (self._build_ring_tick() if self.engine == "ring"
                    else self._build_fused_tick())
            axis = self.axis

            # check_vma=False: varying-axis inference does not yet
            # propagate through pallas_call (upstream jax limitation; the
            # error message recommends exactly this). Collectives remain
            # explicit (pmean in the learner), so semantics are unchanged.
            @partial(
                jax.shard_map,
                mesh=self.mesh,
                in_specs=(self.carry_specs,),
                out_specs=(self.carry_specs, (P(None, axis), P(None))),
                check_vma=False,
            )
            def chunk(carry):
                return jax.lax.scan(tick, carry, length=scan_steps)

            return jax.jit(chunk)

        agent = self.agent
        buffer = self.buffer
        env_params = self.env_params
        envs_per_shard = self.envs_per_shard
        k = self.collect_drones
        reset_env_every = self.reset_env_every
        axis = self.axis

        def tick(carry, _):
            rng, env_states, obs, ag_state, bstate, step = carry
            # Per-shard stream: fold the replicated key with the chip index.
            local = jax.random.fold_in(rng, jax.lax.axis_index(axis))
            local = jax.random.fold_in(local, step)
            rand_key, act_key, step_key, sample_key, reset_key = (
                jax.random.split(local, 5))

            actions = jax.random.randint(
                rand_key, (envs_per_shard, env_params.n_drones), 0, NUM_ACTIONS)
            dqn_actions = agent.act(act_key, obs[:, 0], ag_state)
            actions = actions.at[:, 0].set(dqn_actions)

            step_keys = jax.random.split(step_key, envs_per_shard)
            env_states, rewards, dones = env_core.step_batch(
                step_keys, env_states, actions, env_params)
            next_obs = env_core.observe_batch(env_states, env_params, k)
            next_obs = next_obs.reshape(envs_per_shard, k, agent.obs_dim)

            exps = {
                "obs": obs.reshape(envs_per_shard * k, agent.obs_dim),
                "actions": actions[:, :k].reshape(-1),
                "rewards": rewards[:, :k].reshape(-1),
                "next_obs": next_obs.reshape(envs_per_shard * k, agent.obs_dim),
                "dones": dones[:, :k].reshape(-1),
            }
            bstate = buffer.push_many(bstate, exps)

            def do_train(operand):
                ag, bs, key = operand
                batch = buffer.sample(key, bs)
                batch = dict(batch, dones=batch["dones"].astype(jnp.float32))
                return agent.train_step_distributed(ag, batch, axis)

            def no_train(operand):
                zero = jax.lax.pmean(NO_TRAIN_LOSS, axis)
                return operand[0], zero

            ag_state, loss = jax.lax.cond(
                buffer.can_sample(bstate),
                do_train, no_train,
                (ag_state, bstate, sample_key))

            ag_state = agent.apply_schedules(
                ag_state, step, jnp.array(False))

            def fresh(rkey):
                states = env_core.reset_batch(rkey, env_params, envs_per_shard)
                o = env_core.observe_batch(states, env_params, k)
                o = o.reshape(envs_per_shard, k, agent.obs_dim)
                return ensure_varying((states, o), axis)

            env_states, next_obs = jax.lax.cond(
                step % reset_env_every == 0,
                fresh, lambda _: (env_states, next_obs), reset_key)

            rng = jax.random.fold_in(rng, 1)
            carry = (rng, env_states, next_obs, ag_state, bstate, step + 1)
            return carry, (rewards[:, 0], loss)

        @partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(self.carry_specs,),
            out_specs=(self.carry_specs, (P(None, axis), P(None))),
        )
        def chunk(carry):
            return jax.lax.scan(tick, carry, length=scan_steps)

        return jax.jit(chunk)
