"""End-to-end on-device DQN training.

The entire actor-learner loop — batched env physics, ε-greedy inference,
replay writes/reads, TD backward, Adam, target sync, periodic env resets —
is a single jitted ``lax.scan`` body. Host↔device traffic happens only at
chunk boundaries (every ``--max_scan_steps``) and at eval/checkpoint
points, so the TPU never stalls on Python.

CLI surface mirrors the reference trainer (reference: train_jax.py:322-389)
with additions: ``--collect_drones`` (learn from the first k drones of
every env instead of only drone 0), ``--profile`` (dump a
``jax.profiler`` trace), ``--save_train_state`` / ``--resume_from``
(full-state checkpointing; resume is bitwise-equivalent to an unbroken
run), ``--load_from_checkpoint`` (weights-only warm start),
``--engine`` (fused-Pallas vs jnp), ``--ring_obs_dtype`` /
``--fast_rng`` (ring-engine storage / RNG speed knobs),
``--tensorboard_dir`` (per-chunk reward/ε/TD-loss curves) and
``--inspect_memory`` (replay diagnostics).

Run:  python -m dronerl_tpu.train --num_envs 1024 --num_steps 100000
"""

import argparse
import ast
import json
import logging
import math
import os
import statistics
from datetime import datetime
from timeit import default_timer as timer
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dronerl_tpu import replay
from dronerl_tpu.agents.dqn import DQN, DQNConfig, DQNState
from dronerl_tpu.constants import NO_TRAIN_LOSS, NUM_ACTIONS
from dronerl_tpu.env import core as env_core
from dronerl_tpu.env.types import EnvParams

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s [%(levelname)-5.5s] [%(name)-12.12s]: %(message)s",
)
logger = logging.getLogger("dronerl_tpu.train")


def setup_compilation_cache(path: str = "./jax_cache") -> None:
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def env_params_from_args(args, eval_mode: bool = False) -> EnvParams:
    n_drones = args.n_drones
    grid_size = args.grid_size
    if eval_mode:
        n_drones = args.eval_n_drones or n_drones
        grid_size = args.eval_grid_size or grid_size
        if args.wrapper == "global" and grid_size != args.grid_size:
            # The window wrapper's obs_dim is grid-independent, so a
            # different eval arena is fine; the global wrapper's obs_dim
            # IS the grid — a trained Q-net cannot consume it. Fail here
            # (before training starts) rather than at final-eval trace.
            raise ValueError(
                f"--eval_grid_size {grid_size} != --grid_size "
                f"{args.grid_size} is impossible with --wrapper global: "
                "the full-grid observation's dimensionality is the grid, "
                "so the trained network cannot evaluate on another size")
    params = EnvParams(
        n_drones=n_drones,
        grid_size=grid_size,
        window_radius=args.window_radius,
        pickup_reward=args.pickup_reward,
        delivery_reward=args.delivery_reward,
        crash_reward=args.crash_reward,
        charge_reward=args.charge_reward,
        packets_factor=args.packets_factor,
        dropzones_factor=args.dropzones_factor,
        stations_factor=args.stations_factor,
        skyscrapers_factor=args.skyscrapers_factor,
        wrapper=args.wrapper,
    )
    if eval_mode:
        # The train-mode params hit reset()/validate() immediately; the
        # eval arena otherwise only materializes AFTER training — an
        # overfull --eval_grid_size/--eval_n_drones combination must not
        # cost a completed run (train() calls this upfront).
        params.validate()
    return params


def agent_config_from_args(args) -> DQNConfig:
    if args.epsilon_decay is None:
        # ε reaches 50% of its range after the configured half-life
        # fraction of training (matches the reference derivation).
        eps_decay = (
            1 - 0.5 * (1 - args.epsilon_end / args.epsilon_start)
        ) ** (1 / (args.epsilon_decay_half_life_fraction * args.num_steps))
    else:
        eps_decay = args.epsilon_decay
    return DQNConfig(
        network_type=args.network_type,
        conv_matmul=getattr(args, "conv_matmul", False),
        hidden_layers=tuple(args.hidden_layers),
        conv_layers=args.conv_layers,
        conv_dense_layers=tuple(args.conv_dense_layers),
        target_update_interval=args.target_update_interval,
        epsilon_start=args.epsilon_start,
        epsilon_decay=eps_decay,
        epsilon_end=args.epsilon_end,
        epsilon_decay_every=args.epsilon_decay_every,
        gamma=args.gamma,
        learning_rate=args.learning_rate,
        tau=args.tau,
    )


def build_train_step(
    agent: DQN,
    buffer: replay.ReplayBuffer,
    env_params: EnvParams,
    num_envs: int,
    collect_drones: int,
    reset_env_every: int,
):
    """Construct the fused scan body. Pure function of its carry."""
    obs_dim = agent.obs_dim

    def learner_obs(states) -> jax.Array:
        # windows only for the k learner slots: (E, k, obs_dim)
        full = env_core.observe_batch(states, env_params, collect_drones)
        return full.reshape(num_envs, collect_drones, obs_dim)

    def tick(carry, _):
        rng, env_states, obs, ag_state, bstate, step = carry

        # One wide split per tick: sequential key derivations serialize on
        # the hash latency, so every per-tick key comes from a single
        # threefry invocation (measured ~4x shorter RNG critical path).
        rng, rand_key, act_key, step_key, sample_key, reset_key = (
            jax.random.split(rng, 6))

        # Opponent policy: uniform random for every drone in every env.
        actions = jax.random.randint(
            rand_key, (num_envs, env_params.n_drones), 0, NUM_ACTIONS)

        # Learner policy: one batched forward pass for all envs at once.
        dqn_actions = agent.act(act_key, obs[:, 0], ag_state)
        actions = actions.at[:, 0].set(dqn_actions)

        # Physics.
        step_keys = jax.random.split(step_key, num_envs)
        env_states, rewards, dones = env_core.step_batch(
            step_keys, env_states, actions, env_params)
        next_obs = learner_obs(env_states)

        # Replay: drone-0 (or first-k-drones) experience from every env.
        k = collect_drones
        exps = {
            "obs": obs.reshape(num_envs * k, obs_dim),
            "actions": actions[:, :k].reshape(-1),
            "rewards": rewards[:, :k].reshape(-1),
            "next_obs": next_obs.reshape(num_envs * k, obs_dim),
            "dones": dones[:, :k].reshape(-1),
        }
        bstate = buffer.push_many(bstate, exps)

        # Learn once the buffer is warm.
        def do_train(operand):
            ag, bs, key = operand
            batch = buffer.sample(key, bs)
            batch = dict(batch, dones=batch["dones"].astype(jnp.float32))
            ag, loss = agent.train_step(ag, batch)
            return ag, loss

        ag_state, loss = jax.lax.cond(
            buffer.can_sample(bstate),
            do_train,
            lambda operand: (operand[0], NO_TRAIN_LOSS),
            (ag_state, bstate, sample_key),
        )

        # Target sync + exploration schedule (predicated selects,
        # not conds — see DQN.apply_schedules).
        ag_state = agent.apply_schedules(ag_state, step, dones[0, 0])

        # Periodic full reset keeps the task distribution stationary.
        def fresh_envs(reset_rng):
            states = env_core.reset_batch(reset_rng, env_params, num_envs)
            return states, learner_obs(states)

        env_states, next_obs = jax.lax.cond(
            step % reset_env_every == 0,
            fresh_envs,
            lambda _: (env_states, next_obs),
            reset_key,
        )

        carry = (rng, env_states, next_obs, ag_state, bstate, step + 1)
        return carry, (rewards[:, 0], ag_state.epsilon, loss)

    return tick


def build_train_step_fused(
    agent: DQN,
    buffer: replay.StreamReplay,
    env_params: EnvParams,
    num_envs: int,
    collect_drones: int,
    reset_env_every: int,
    interpret: bool = False,
    rng_rounds: int = 20,
):
    """Feature-major scan body around the fused step+observe kernel.

    Superseded in the production path by :func:`build_train_step_full`
    (actor + reset fused in-kernel) and :func:`build_train_step_ring`;
    kept as the engine for callers that need externally-supplied actions
    with feature-major replay.

    The env state, observations and replay storage all live transposed
    (features on sublanes, envs/slots on lanes); the whole environment
    tick — per-env PRNG, physics, respawns, window observations — is ONE
    kernel dispatch (ops/fused_tick.py). Env-transition semantics match
    :func:`build_train_step`; trainer-level PRNG consumption shapes
    differ (non-contractual), and replay next_obs recovery is the
    stream approximation documented on :class:`replay.StreamReplay` —
    on the 1-in-``reset_env_every`` ticks that cross a periodic reset,
    the sampled next_obs is the post-reset observation rather than the
    pre-reset one the jnp engine stores.
    """
    from dronerl_tpu.ops import fused_tick

    obs_dim = agent.obs_dim
    k = collect_drones

    def tick(carry, _):
        rng, tstate, obs_t, ag_state, bstate, step = carry
        rng, rand_key, act_key, step_key, sample_key, reset_key = (
            jax.random.split(rng, 6))

        actions_t = jax.random.randint(
            rand_key, (env_params.n_drones, num_envs), 0, NUM_ACTIONS)
        dqn_actions = agent.act_t(act_key, obs_t[:obs_dim], ag_state)
        actions_t = actions_t.at[0].set(dqn_actions)

        tstate, rewards_t, dones_t, next_obs_t = fused_tick.tick_fused(
            step_key, tstate, actions_t, env_params, k, interpret,
            rng_rounds=rng_rounds)

        # Single-stream replay: only the CURRENT observation is stored;
        # next_obs is recovered at sample time as the slot one step later
        # in the ring (see replay.StreamReplay).
        exps = {
            "obs": jnp.concatenate(
                [obs_t[i * obs_dim : (i + 1) * obs_dim] for i in range(k)],
                axis=1) if k > 1 else obs_t,
            "actions": actions_t[:k].reshape(-1),
            "rewards": rewards_t[:k].reshape(-1),
            "dones": dones_t[:k].reshape(-1),
        }
        bstate = buffer.push_many(bstate, exps)

        def do_train(operand):
            ag, bs, key = operand
            batch = buffer.sample(key, bs)
            batch = dict(batch, dones=batch["dones"].astype(jnp.float32))
            return agent.train_step_t(ag, batch)

        ag_state, loss = jax.lax.cond(
            buffer.can_sample(bstate),
            do_train,
            lambda operand: (operand[0], NO_TRAIN_LOSS),
            (ag_state, bstate, sample_key),
        )

        ag_state = agent.apply_schedules(ag_state, step, dones_t[0, 0])

        def fresh_envs(reset_rng):
            states = env_core.reset_batch(reset_rng, env_params, num_envs)
            obs = env_core.observe_batch(states, env_params, k)
            return (fused_tick.to_tstate(states),
                    obs.reshape(num_envs, k * obs_dim).T)

        tstate, next_obs_t = jax.lax.cond(
            step % reset_env_every == 0,
            fresh_envs,
            lambda _: (tstate, next_obs_t),
            reset_key,
        )

        carry = (rng, tstate, next_obs_t, ag_state, bstate, step + 1)
        return carry, (rewards_t[0], ag_state.epsilon, loss)

    return tick


def build_train_step_full(
    agent: DQN,
    buffer: replay.StreamReplay,
    env_params: EnvParams,
    num_envs: int,
    collect_drones: int,
    reset_env_every: int,
    interpret: bool = False,
    rng_rounds: int = 20,
    actor_rng_rounds=None,
):
    """Scan body around the all-in-one kernel (ops/fused_tick.full_tick_fused).

    The env side of the tick — ε-greedy actor, random opponents, physics,
    respawns, observations AND the periodic reset — is ONE kernel
    dispatch; outside remain only the replay ring writes and the TD
    update. The RNG contract is documented on full_tick_fused (trainer-
    level streams are not parity-locked). ``rng_rounds < 20`` selects the
    reduced-round fast-RNG mode (ops/step_kernel.threefry2x32) — faster,
    statistically sound spawns/exploration, but transitions are no longer
    bit-identical to the reference env.
    """
    from dronerl_tpu.ops import fused_tick

    obs_dim = agent.obs_dim
    k = collect_drones

    def tick(carry, _):
        rng, tstate, obs_t, ag_state, bstate, step = carry
        rng, step_key, sample_key = jax.random.split(rng, 3)

        tstate, rewards_t, dones_t, actions_t, next_obs_t = (
            fused_tick.full_tick_fused(
                step_key, tstate, obs_t, ag_state.params, ag_state.epsilon,
                step % reset_env_every == 0, env_params, k, interpret,
                rng_rounds=rng_rounds, net_spec=agent.net_spec,
                actor_rng_rounds=actor_rng_rounds))

        exps = {
            "obs": jnp.concatenate(
                [obs_t[i * obs_dim : (i + 1) * obs_dim] for i in range(k)],
                axis=1) if k > 1 else obs_t,
            "actions": actions_t[:k].reshape(-1),
            "rewards": rewards_t[:k].reshape(-1),
            "dones": dones_t[:k].reshape(-1),
        }
        bstate = buffer.push_many(bstate, exps)

        # Sample OUTSIDE the cond so the cond never captures the ring
        # buffers (conds can force copies of captured operands).
        batch = buffer.sample(sample_key, bstate)
        batch = dict(batch, dones=batch["dones"].astype(jnp.float32))

        def do_train(operand):
            ag, b = operand
            return agent.train_step_t(ag, b)

        ag_state, loss = jax.lax.cond(
            buffer.can_sample(bstate),
            do_train,
            lambda operand: (operand[0], NO_TRAIN_LOSS),
            (ag_state, batch),
        )
        ag_state = agent.apply_schedules(ag_state, step, dones_t[0, 0])

        carry = (rng, tstate, next_obs_t, ag_state, bstate, step + 1)
        return carry, (rewards_t[0], ag_state.epsilon, loss)

    return tick


def build_train_step_ring(
    agent: DQN,
    env_params: EnvParams,
    num_envs: int,
    capacity: int,
    batch_size: int,
    reset_env_every: int,
    interpret: bool = False,
    rng_rounds: int = 20,
    actor_rng_rounds=None,
    sample_before_kernel: bool = False,
    collect_drones: int = 1,
    in_kernel_td=None,
):
    # The ring dtype is whatever init_ring_carry allocated (obs_dtype):
    # bf16 halves the kernel's per-step HBM obs write; the actor and TD
    # learner always compute in f32 (MXU matmuls round f32 operands to
    # bf16 internally, so nothing is lost on the compute path).
    """Scan body where the replay ring IS the kernel's observation buffer.

    The all-in-one kernel (fused_tick.full_tick_fused_ring) reads this
    tick's observation from the ring slice written by the previous tick
    and writes the next observation into the following slice — the
    training loop never materializes, copies or pushes an observation
    tensor. Only the tiny scalar rings (actions/rewards/dones) and the TD
    update remain outside the kernel.

    ``collect_drones`` (k) widens experience collection past the
    reference trainer's drone-0 default: the kernel stacks the k drones'
    observations as row groups of each ring column (``capacity`` counts
    ring COLUMNS = env slots; k transitions live per column), the scalar
    rings grow a leading k axis, and sampling draws batch_size//k
    column indices per drone row-group so every gather keeps a static
    row slice. k == 1 keeps the historical flat scalar-ring shapes.

    Carry: ``(rng, (tstate, obs_ring), (act_ring, rew_ring, done_ring),
    ag_state, (), step)`` — the trainer-wide convention keeps the agent
    state at position -3 and the step counter at -1. Seed the ring with
    the initial observation at slot 0 before the first tick.
    """
    from dronerl_tpu.ops import fused_tick

    if capacity % num_envs != 0 or capacity < 2 * num_envs:
        raise ValueError("capacity must be a multiple of num_envs, >= 2x")
    if agent.config.network_type == "conv" and agent.net_spec is None:
        raise ValueError(
            "the ring engine runs the actor in-kernel; conv networks need "
            "conv_matmul=True (CLI: --conv_matmul) so the kernel and the "
            "XLA-side learner share the im2col contraction structure")
    k = collect_drones
    if batch_size % k != 0:
        raise ValueError("batch_size must be a multiple of collect_drones")
    nb = capacity // num_envs  # ring length in steps
    obs_dim = agent.obs_dim

    # In-kernel TD+Adam (round 5, opt-in): for dense nets the whole TD
    # update can ride grid step 0 of the env kernel. The batch must be a
    # kernel INPUT, but sampling before the dispatch makes the gather a
    # second reader of the donated ring (XLA then copies the whole ring
    # every step — measured +280 µs), so the batch is PIPELINED one step
    # through the carry's aux slot: gathered after tick t's kernel (the
    # normal sample-after window, single reader), trained inside tick
    # t+1's kernel. Measured on-chip it is throughput-NEUTRAL vs the XLA
    # learner (±15 µs/step of ~1,280: XLA already hides the tiny TD
    # fusions under the kernel's DMA phases — PERF.md "In-kernel TD:
    # a verified neutral result"), so the default stays the XLA learner
    # (simpler state flow, exact optax numerics); the in-kernel path is
    # kept tested (tests/test_fused_tick.py) as the building block for
    # backends where the XLA tail is NOT free.
    td_ok = (agent.net_spec is None
             and agent.config.network_type == "dense")
    if in_kernel_td is None:
        in_kernel_td = False
    elif in_kernel_td and not td_ok:
        raise ValueError(
            "in_kernel_td requires a dense network (got network_type=%s)"
            % agent.config.network_type)
    td_hparams = None
    if in_kernel_td:
        td_hparams = (float(agent.config.gamma),
                      float(agent.config.learning_rate),
                      0.9, 0.999, 1e-8)  # optax.adam defaults
        assert NO_TRAIN_LOSS == -1.0  # the kernel hardcodes the sentinel

    def tick(carry, _):
        rng, (tstate, ring), (a_ring, r_ring, d_ring), ag_state, aux, step = (
            carry)
        rng, step_key, sample_key = jax.random.split(rng, 3)

        read_slot = (step % nb) * num_envs
        write_slot = ((step + 1) % nb) * num_envs

        def gather_batch(ring, valid, base_step):
            """Uniform sample over ``valid`` slots starting at base_step."""
            return fused_tick.ring_gather_batch(
                sample_key, ring, a_ring, r_ring, d_ring, valid, base_step,
                num_envs=num_envs, capacity=capacity, batch_size=batch_size,
                collect=k, obs_dim=obs_dim)

        if sample_before_kernel and not in_kernel_td:
            # Gather BEFORE the aliased kernel touches the ring.
            # Measured equivalent to sampling after (scripts/
            # ring_experiments.py; XLA inserts no ring copy either way —
            # PERF.md "Ring sampling order"), so the default stays False:
            # sampling after sees one step more data and works for
            # 2-step rings (here nb=2 would never warm up).
            # Complete tuples at entry of tick t: steps
            # [max(0, t+2-nb), t-1] (slot (t+1)%nb is overwritten by this
            # tick's write, so transitions touching it are excluded).
            valid = jnp.minimum(step, nb - 2) * num_envs
            batch = gather_batch(ring, valid, jnp.maximum(0, step + 2 - nb))

        # valid counts ring COLUMNS; each column holds k transitions and
        # the per-drone gathers draw batch_size//k columns each.
        if in_kernel_td:
            # The carried batch was gathered after the PREVIOUS tick with
            # valid = min(step, nb-1) columns (zero-seeded at step 0, so
            # step 0 never trains — min(0, ·) == 0).
            can_train = jnp.minimum(step, nb - 1) * num_envs >= (
                batch_size // k)
            adam = ag_state.opt_state[0]
            (tstate, rewards_t, dones_t, actions_t, ring,
             new_params, new_mu, new_nu, loss) = (
                fused_tick.full_tick_fused_ring(
                    step_key, tstate, ring, read_slot, write_slot,
                    ag_state.params, ag_state.epsilon,
                    step % reset_env_every == 0, env_params, k, interpret,
                    rng_rounds=rng_rounds, net_spec=agent.net_spec,
                    actor_rng_rounds=actor_rng_rounds,
                    td_hparams=td_hparams,
                    td_batch=aux,
                    td_aux=(ag_state.target_params, adam.mu, adam.nu,
                            can_train, adam.count)))
            new_count = jnp.where(
                can_train, optax.safe_increment(adam.count), adam.count)
            ag_state = ag_state.replace(
                params=new_params,
                opt_state=(adam._replace(
                    count=new_count, mu=new_mu, nu=new_nu),)
                + tuple(ag_state.opt_state[1:]))
        else:
            tstate, rewards_t, dones_t, actions_t, ring = (
                fused_tick.full_tick_fused_ring(
                    step_key, tstate, ring, read_slot, write_slot,
                    ag_state.params, ag_state.epsilon,
                    step % reset_env_every == 0, env_params, k, interpret,
                    rng_rounds=rng_rounds, net_spec=agent.net_spec,
                    actor_rng_rounds=actor_rng_rounds))

        # Scalars live at the same slot as this tick's input observation.
        a_ring, r_ring, d_ring = fused_tick.ring_scalar_writes(
            a_ring, r_ring, d_ring, actions_t, rewards_t, dones_t,
            read_slot, k)

        if in_kernel_td or not sample_before_kernel:
            # Complete tuples after tick t: steps [max(0, t+2-nb), t] —
            # the newest ring write overwrote the oldest observation.
            valid = jnp.minimum(step + 1, nb - 1) * num_envs
            batch = gather_batch(ring, valid, jnp.maximum(0, step + 2 - nb))

        if in_kernel_td:
            aux = batch  # consumed by the NEXT tick's in-kernel learner
        else:
            ag_state, loss = jax.lax.cond(
                valid >= batch_size // k,
                lambda op: agent.train_step_t(op[0], op[1]),
                lambda op: (op[0], NO_TRAIN_LOSS),
                (ag_state, batch),
            )
        ag_state = agent.apply_schedules(ag_state, step, dones_t[0, 0])

        carry = (rng, (tstate, ring), (a_ring, r_ring, d_ring),
                 ag_state, aux, step + 1)
        return carry, (rewards_t[0], ag_state.epsilon, loss)

    return tick


def init_ring_carry(agent: DQN, env_params: EnvParams, num_envs: int,
                    capacity: int, rng: jax.Array,
                    obs_dtype=jnp.float32, collect_drones: int = 1,
                    batch_size=None, in_kernel_td=None):
    """Initial carry for :func:`build_train_step_ring`.

    ``capacity`` counts ring columns; with ``collect_drones`` = k the obs
    ring stacks the k drones' observations as row groups (k·obs_dim rows)
    and the scalar rings carry a leading k axis (k == 1 keeps the
    historical flat shapes).
    """
    from dronerl_tpu.ops import fused_tick

    k = collect_drones
    env_states = env_core.reset_batch(rng, env_params, num_envs)
    tstate = fused_tick.to_tstate(env_states)
    obs0 = env_core.observe_batch(env_states, env_params, k).reshape(
        num_envs, k * agent.obs_dim).T
    ring = jnp.zeros((k * agent.obs_dim, capacity), obs_dtype)
    ring = jax.lax.dynamic_update_slice(ring, obs0.astype(obs_dtype), (0, 0))
    ag_state = agent.init_state(rng)
    scalar_shape = (capacity,) if k == 1 else (k, capacity)
    # Aux slot: the in-kernel TD learner pipelines its replay batch one
    # step through the carry (see build_train_step_ring) — zero-seeded,
    # never trained on (step 0's can_train is False). Must mirror
    # build_train_step_ring's in_kernel_td selection: pass the same
    # in_kernel_td (+ batch_size) pair to both builders. Default off —
    # the XLA learner measured throughput-equivalent (PERF.md round 5).
    if in_kernel_td is None:
        in_kernel_td = False
    if in_kernel_td and batch_size is None:
        raise ValueError("in_kernel_td carries the replay batch through "
                         "the carry — pass batch_size")
    if in_kernel_td:
        aux = {
            "obs": jnp.zeros((agent.obs_dim, batch_size), jnp.float32),
            "next_obs": jnp.zeros((agent.obs_dim, batch_size), jnp.float32),
            "actions": jnp.zeros((batch_size,), jnp.int32),
            "rewards": jnp.zeros((batch_size,), jnp.float32),
            "dones": jnp.zeros((batch_size,), jnp.float32),
        }
    else:
        aux = ()
    return (
        rng, (tstate, ring),
        (jnp.zeros(scalar_shape, jnp.int32),
         jnp.zeros(scalar_shape, jnp.float32),
         jnp.zeros(scalar_shape, jnp.int8)),
        ag_state, aux, jnp.array(0),
    )


def fused_engine_supported(agent: DQN, env_params: EnvParams,
                           num_envs: int) -> bool:
    """Fused Pallas engine availability for this config + backend."""
    on_tpu = jax.devices()[0].platform in ("tpu", "axon") or (
        "TPU" in jax.devices()[0].device_kind.upper())
    return on_tpu and not fused_engine_problems(env_params, num_envs)


def fused_engine_problems(env_params: EnvParams, num_envs: int) -> list:
    """Human-readable reasons the fused engine can't run this config.

    Used to fail fast with a descriptive error when ``--engine fused`` is
    forced — unsupported configs would otherwise die deep inside Mosaic
    with an opaque VMEM/layout error.
    """
    from dronerl_tpu.ops import fused_tick

    problems = []
    dev = jax.devices()[0]
    if dev.platform not in ("tpu", "axon") and "TPU" not in dev.device_kind.upper():
        problems.append(
            f"backend is {dev.platform!r}, the fused Pallas kernels need a TPU "
            f"(use --engine jnp, or auto)")
    if env_params.wrapper not in ("window", "global"):
        problems.append(
            f"wrapper={env_params.wrapper!r} (only 'window' and 'global' "
            f"observations are implemented in-kernel)")
    if env_params.num_cells > fused_tick.MAX_CELLS:
        problems.append(
            f"grid {env_params.grid_size}x{env_params.grid_size} = "
            f"{env_params.num_cells} cells > {fused_tick.MAX_CELLS} "
            f"(kernel sublane budget)")
    if env_params.n_drones > fused_tick.MAX_DRONES:
        problems.append(
            f"n_drones={env_params.n_drones} > {fused_tick.MAX_DRONES}")
    if env_params.num_packets < env_params.n_drones:
        problems.append(
            f"num_packets ({env_params.num_packets}) < n_drones "
            f"({env_params.n_drones}) — the in-kernel respawn assumes at "
            f"least one packet slot per drone")
    if num_envs < 128:
        problems.append(
            f"num_envs={num_envs} < 128 (a lane block must fill; small "
            f"batches belong on the jnp engine)")
    elif num_envs % 128 != 0:
        # _block_for would fall back to a num_envs-lane block, which can
        # still die inside Mosaic with an opaque layout error — pre-empt it.
        problems.append(
            f"num_envs={num_envs} is not a multiple of 128 (the kernel "
            f"tiles envs over 128-lane blocks)")
    return problems


def ring_skip_reasons(dense: bool, ring_capacity: int, push_size: int,
                      batch_size: int, collect_drones: int) -> list:
    """Why a fused-engine config fell off the ring engine (auto-select).

    Mirrors the ``use_ring`` predicate in ``main``; each reason names the
    gate AND the lever that re-enables the fastest engine, so crossing a
    gate is a visible, explained perf cliff instead of a silent one
    (PERF.md "a donated buffer tolerates no second reader" for the ring-
    size gate).
    """
    reasons = []
    if not dense:
        reasons.append(
            "conv network without --conv_matmul (the im2col lowering "
            "lets conv nets run in-kernel)")
    if ring_capacity > 4 * push_size:
        reasons.append(
            f"replay ring of {ring_capacity} transitions > 4 env-batches "
            f"({4 * push_size}); a larger donated ring makes XLA copy it "
            "every step — shrink --memory_size or raise --num_envs to "
            "re-enable the ring engine")
    if batch_size % collect_drones != 0:
        reasons.append(
            f"--batch_size {batch_size} not divisible by "
            f"--collect_drones {collect_drones}")
    return reasons


def rng_rounds_from_args(args) -> Tuple[int, object]:
    """Translate ``--fast_rng {off,actor,full}`` into kernel knobs.

    Returns ``(rng_rounds, actor_rng_rounds)`` for the fused engines:
    'off' → (20, None) — everything bit-parity; 'actor' → (20, 8) — the
    hybrid: env cell-uniforms/spawn chains stay at the parity-locked 20
    rounds, only the ε-greedy actor rows drop to 8 (transitions stay
    bit-exact vs the reference; measured +1.5%, PERF.md "Hybrid RNG");
    'full' → (8, None) — all in-kernel uniforms at 8 rounds, NOT
    bit-parity. Legacy boolean True (pre-round-5 API) maps to 'full'.
    """
    mode = getattr(args, "fast_rng", "off")
    if mode in (False, None, "off"):
        return 20, None
    if mode == "actor":
        return 20, 8
    return 8, None  # "full" or legacy True


def log_chunk_histograms(metrics_logger, agent: DQN, carry, losses,
                         use_ring: bool, use_fused: bool, step: int,
                         probe: int = 1024) -> None:
    """Per-chunk q-value / TD-loss / replay-action histograms.

    Mirrors the reference's TensorBoard histograms emitted from inside
    ``learn`` (reference: torch_impl/agents/dqn.py:371-374,416-419) at
    chunk granularity — per-step host logging would defeat the fused
    on-device scan, and a chunk is this trainer's logging quantum.

    The q-value histogram is the online net evaluated on a probe of
    replay observations; the action histogram is the replay ring's action
    column (what the reference's ``inspect_memory`` plots).
    """
    losses = jnp.ravel(losses)
    trained = losses[losses >= 0.0]  # drop warm-up no-train ticks
    if trained.size:
        metrics_logger.log_histogram("td_loss", trained, step)

    ag_state = carry[-3]
    if use_ring:
        (_tstate, ring) = carry[1]
        num_envs = _tstate.ground.shape[1]  # feature-major: (cells, E)
        steps_done = int(carry[-1])
        if not steps_done:
            return
        # Histogram only slots actually written: obs slot 0 is seeded
        # pre-run and each tick fills one num_envs-column slot (scalars
        # at the read slot) — a short first chunk must not count the
        # ring's zero-initialized remainder as observations/action 0.
        valid_obs = min(ring.shape[1], (steps_done + 1) * num_envs)
        # collect_drones > 1 stacks per-drone row groups; probe drone 0
        obs = ring[:agent.obs_dim, :min(probe, valid_obs)].T.astype(
            jnp.float32)
        actions = carry[2][0]
        if actions.ndim == 2:  # (k, capacity) scalar rings: drone 0 row
            actions = actions[0]
        actions = actions[:min(actions.shape[0], steps_done * num_envs)]
    elif use_fused:
        bstate = carry[-2]
        size = int(bstate.size)
        if not size:
            return
        obs = bstate.storage["obs"][:, :min(probe, size)].T
        actions = bstate.storage["actions"][:size]
    else:
        bstate = carry[-2]
        size = int(bstate.size)
        if not size:
            return
        obs = bstate.storage["obs"][:min(probe, size)]
        actions = bstate.storage["actions"][:size]
    q = agent.q_values(ag_state.params, jnp.asarray(obs, jnp.float32))
    metrics_logger.log_histogram("q_values", q, step)
    metrics_logger.log_histogram("replay_actions", actions, step)


_EVAL_FN_CACHE: dict = {}
_EVAL_FN_CACHE_MAX = 16  # FIFO bound; sweeps cycle few distinct programs

# DQNConfig fields that can NEVER enter the greedy forward pass — the
# learner schedule. Everything else (current and future fields) is part
# of the eval-program cache key via _eval_forward_key.
_LEARNER_ONLY_FIELDS = {
    "gamma": 0.0,
    "epsilon_start": 0.0,
    "epsilon_decay": 0.0,
    "epsilon_end": 0.0,
    "epsilon_decay_every": None,
    "learning_rate": 0.0,
    "target_update_interval": 1,
    "tau": 1.0,
}


def _eval_forward_key(cfg: DQNConfig) -> DQNConfig:
    """Normalize learner-only hypers so configs that share a forward
    pass hash identically; unknown (future) fields flow through into the
    key, failing safe toward a re-trace instead of a stale program."""
    import dataclasses

    return dataclasses.replace(cfg, **_LEARNER_ONLY_FIELDS)


def _eval_tick_keys(rng):
    """Four independent streams per eval tick: carry, opponents' random
    actions, the agent's act call, and the env step. The opponents and
    the agent must never share a key — today's greedy path ignores its
    key, but an ε-eval would silently correlate the two streams."""
    return jax.random.split(rng, 4)


def evaluate(
    args,
    agent: DQN,
    ag_state: DQNState,
) -> Tuple[Tuple[float, float], Tuple[float, float]]:
    """Greedy eval of drone 0 vs random opponents, vmapped over seeds.

    All ``num_evals`` evaluation episodes run as one compiled program: the
    seed axis is just another batch dimension (the reference loops over
    seeds in Python, reference: train_jax.py:308-316).
    """
    env_params = env_params_from_args(args, eval_mode=True)
    num_seeds = args.num_evals
    seeds = jnp.arange(num_seeds, dtype=jnp.uint32) + args.eval_seed
    reset_keys = jax.vmap(jax.random.PRNGKey)(seeds)

    # One jitted program per (agent config, eval arena, episode length):
    # --eval_while_training calls this every chunk, and rebuilding the
    # closure each time would defeat the in-memory jit cache (a fresh
    # function identity re-traces the full num_eval_steps scan). The
    # mutable agent state is a traced ARGUMENT, not a closure capture.
    # Key on the FULL config normalized through _eval_forward_key (every
    # field except an explicit learner-only denylist), so a future
    # forward-affecting DQNConfig field is picked up automatically —
    # while sweep trials that differ only in learner hypers still share
    # one traced 10k-step program.
    cache_key = (_eval_forward_key(agent.config), agent.obs_dim,
                 env_params, args.num_eval_steps)
    run_episodes = _EVAL_FN_CACHE.get(cache_key)
    if run_episodes is None:
        obs_dim = agent.obs_dim

        def episode_rewards(reset_key, ag_state):
            state = env_core.reset(reset_key, env_params)

            def tick(carry, _):
                rng, st = carry
                rng, opp_key, act_key, step_key = _eval_tick_keys(rng)
                actions = jax.random.randint(
                    opp_key, (env_params.n_drones,), 0, NUM_ACTIONS)
                obs = env_core.observe(st, env_params, 1).reshape(1, obs_dim)
                greedy = agent.act(act_key, obs, ag_state, greedy=True)[0]
                actions = actions.at[0].set(greedy)
                st, rewards, _ = env_core.step(
                    step_key, st, actions, env_params)
                return (rng, st), rewards

            (_, _), rewards = jax.lax.scan(
                tick, (reset_key, state), length=args.num_eval_steps)
            return rewards  # (steps, N)

        run_episodes = jax.jit(jax.vmap(episode_rewards, in_axes=(0, None)))
        if len(_EVAL_FN_CACHE) >= _EVAL_FN_CACHE_MAX:
            _EVAL_FN_CACHE.pop(next(iter(_EVAL_FN_CACHE)))
        _EVAL_FN_CACHE[cache_key] = run_episodes

    rewards = run_episodes(reset_keys, ag_state)
    per_seed_agent = np.asarray(jnp.mean(rewards[:, :, 0], axis=1))
    if env_params.n_drones > 1:
        per_seed_random = np.asarray(jnp.mean(rewards[:, :, 1], axis=1))
    else:
        per_seed_random = np.zeros(num_seeds)
    mean = statistics.mean(per_seed_agent.tolist())
    std = statistics.stdev(per_seed_agent.tolist()) if num_seeds > 1 else 0.0
    rmean = statistics.mean(per_seed_random.tolist())
    rstd = statistics.stdev(per_seed_random.tolist()) if num_seeds > 1 else 0.0
    return (mean, std), (rmean, rstd)


def train(args, metrics_logger=None) -> dict:
    if args.coordinator_address or (args.num_processes or 0) > 1:
        from dronerl_tpu.parallel import initialize_distributed

        initialize_distributed(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    setup_compilation_cache(args.jax_cache_dir)
    env_params = env_params_from_args(args)
    if args.eval_while_training or not args.skip_final_eval:
        # Validate the eval-arena combination upfront (e.g. global
        # wrapper + --eval_grid_size) instead of after training ends.
        env_params_from_args(args, eval_mode=True)
    agent_config = agent_config_from_args(args)

    # Weights-only warm start: the network topology comes from the
    # checkpoint (like the reference's torch warm start, which rebuilds
    # the factory from checkpoint metadata, reference: train_torch.py:70),
    # training hyper-parameters stay CLI-controlled.
    warm_params = None
    if args.load_from_checkpoint:
        from dronerl_tpu.interop import safetensors_io

        ckpt_config, warm_params = safetensors_io.load_checkpoint(
            args.load_from_checkpoint)
        agent_config = agent_config.replace(
            network_type=ckpt_config.network_type,
            hidden_layers=ckpt_config.hidden_layers,
            conv_layers=ckpt_config.conv_layers,
            conv_dense_layers=ckpt_config.conv_dense_layers,
        )
        logger.info("Warm start from %s (%s network)",
                    args.load_from_checkpoint, ckpt_config.network_type)

    logger.info("Env params: %s", env_params)
    logger.info("Agent config: %s", agent_config)
    logger.info("Devices (%d): %s", jax.device_count(), jax.devices())

    run = None
    if args.wandb:
        import wandb

        run = wandb.init(
            project=args.wandb_project,
            group=args.wandb_group,
            entity=args.wandb_entity,
            config=vars(args),
        )

    from dronerl_tpu.utils.metrics import NoLogger, build_logger

    if metrics_logger is None:
        metrics_logger = build_logger(
            tensorboard_dir=args.tensorboard_dir, wandb_run=run)
    log_metrics = not isinstance(metrics_logger, NoLogger)

    run_dir = args.run_dir or os.path.join(
        "output", f"run_{datetime.now().strftime('%Y%m%d_%H%M%S')}")
    os.makedirs(run_dir, exist_ok=True)
    logger.info("Run dir: %s", run_dir)

    agent = DQN(agent_config, env_params)
    rng = jax.random.PRNGKey(args.seed)
    scan_steps = min(args.num_steps, args.max_scan_steps)

    if args.use_sharding:
        # Explicit mesh + shard_map: envs and replay shards per chip,
        # replicated learner, psum gradient sync over ICI.
        from dronerl_tpu.parallel import DistributedTrainer, make_env_mesh

        if agent_config.epsilon_decay_every is None:
            raise ValueError(
                "--use_sharding requires --epsilon_decay_every (episode-"
                "boundary ε decay is not defined across env shards)")
        mesh = make_env_mesh()
        ndev = mesh.devices.size
        if args.engine == "fused":
            problems = fused_engine_problems(
                env_params, args.num_envs // ndev)
            if problems:
                raise ValueError(
                    "--engine fused is not available for this config:\n  - "
                    + "\n  - ".join(problems))
        # Dense nets run the actor in-kernel; conv nets keep the fused env
        # kernel with the conv actor in XLA (same composition as the
        # single-chip path). Ring gating mirrors the single-chip rule:
        # in-kernel actor (dense natively, conv via the im2col lowering),
        # per-shard batch divisible by collect_drones, per-shard ring
        # ≤ 4 env-batches × collect_drones.
        use_sharded_fused = (
            args.engine == "fused"
            or (args.engine == "auto" and fused_engine_supported(
                agent, env_params, args.num_envs // ndev)))
        envs_per_shard = args.num_envs // ndev
        shard_ring_capacity = max(
            -(-max(1, args.memory_size // ndev) // envs_per_shard)
            * envs_per_shard,
            2 * envs_per_shard)
        if (use_sharded_fused
                and (agent_config.network_type == "dense"
                     or agent.net_spec is not None)
                and max(1, args.batch_size // ndev) % args.collect_drones
                == 0
                and shard_ring_capacity
                <= 4 * envs_per_shard * args.collect_drones):
            sharded_engine = "ring"
        elif use_sharded_fused:
            sharded_engine = "fused"
        else:
            sharded_engine = "jnp"
        logger.info("Sharded engine: %s", sharded_engine)
        if sharded_engine == "fused":
            logger.info(
                "Per-shard ring engine skipped (%s); the fused engine is "
                "typically ~25-35%% slower at large env batches",
                "; ".join(ring_skip_reasons(
                    agent_config.network_type == "dense"
                    or agent.net_spec is not None,
                    shard_ring_capacity,
                    envs_per_shard * args.collect_drones,
                    max(1, args.batch_size // ndev),
                    args.collect_drones)))
        rng_rounds, actor_rng_rounds = rng_rounds_from_args(args)
        if (rng_rounds, actor_rng_rounds) != (20, None) \
                and sharded_engine == "jnp":
            logger.warning("--fast_rng only affects the fused engines; "
                           "the jnp engine always uses jax.random")
            rng_rounds, actor_rng_rounds = 20, None
        if actor_rng_rounds is not None and sharded_engine == "fused":
            logger.warning(
                "--fast_rng actor is a no-op on the sharded fused (conv-"
                "XLA-actor) engine: the actor runs in jax.random outside "
                "the kernel; env uniforms stay at the parity 20 rounds")
        trainer = DistributedTrainer(
            agent, env_params, mesh,
            num_envs=args.num_envs,
            buffer_capacity_per_shard=max(1, args.memory_size // ndev),
            batch_size_per_shard=max(1, args.batch_size // ndev),
            collect_drones=args.collect_drones,
            reset_env_every=args.reset_env_every,
            engine=sharded_engine,
            rng_rounds=rng_rounds,
            actor_rng_rounds=actor_rng_rounds,
        )
        carry = trainer.init_carry(
            rng, obs_dtype=jnp.dtype(args.ring_obs_dtype))
        chunk_fn = trainer.build_chunk(scan_steps)

        def run_chunk(carry, _dummy):
            carry, (rewards, losses) = chunk_fn(carry)
            return carry, (rewards, carry[-3].epsilon, losses)

        # Sharded carries hold per-shard buffer layouts; the probe-based
        # q/action histograms only read the single-chip layouts.
        hist_ctx = None
        if args.log_histograms:
            # Mirror the ring-skip explanations: say WHY a default-on
            # feature is silently absent instead of no-op'ing.
            logger.info(
                "--log_histograms: per-chunk q/action histograms read "
                "the single-chip replay layouts and are unavailable for "
                "sharded carries; scalar curves (reward/ε/td_loss) still "
                "log per chunk")
        # For the --inspect_memory epilogue: the sharded fused engine
        # stores feature-major (slots last), jnp row-major; the ring
        # engine keeps no ReplayState and is handled there by type.
        use_fused = sharded_engine == "fused"
    else:
        # Round capacity up to the per-step push size so replay writes hit
        # the contiguous fast path (see replay.push_many).
        push_size = args.num_envs * args.collect_drones
        capacity = math.ceil(args.memory_size / push_size) * push_size
        env_states = env_core.reset_batch(rng, env_params, args.num_envs)
        ag_state = agent.init_state(rng)
        obs = env_core.observe_batch(
            env_states, env_params, args.collect_drones)

        template = {
            "obs": jnp.zeros((agent.obs_dim,), dtype=jnp.float32),
            "actions": jnp.array(0, dtype=jnp.int32),
            "rewards": jnp.array(0.0, dtype=jnp.float32),
            "next_obs": jnp.zeros((agent.obs_dim,), dtype=jnp.float32),
            "dones": jnp.array(False, dtype=jnp.bool_),
        }
        if args.engine == "fused":
            problems = fused_engine_problems(env_params, args.num_envs)
            if problems:
                raise ValueError(
                    "--engine fused is not available for this config:\n  - "
                    + "\n  - ".join(problems))
        use_fused = args.engine == "fused" or (
            args.engine == "auto"
            and fused_engine_supported(agent, env_params, args.num_envs))
        # Ring engine only when the ring is small relative to the env
        # batch: XLA copies the donated ring once per step to satisfy the
        # sample gather (a second reader of a donated buffer), so a ring
        # much larger than one step's observations loses to the non-ring
        # engine's explicit push.
        ring_capacity = max(capacity, 2 * push_size)
        # In-kernel actor coverage: dense natively; conv via the im2col
        # lowering (--conv_matmul, ops/conv2mat.py).
        dense = (agent_config.network_type == "dense"
                 or agent.net_spec is not None)
        # nb = ring length in env-batches (ticks); the ring engine needs a
        # small ring (donation constraint, see below) and batch_size
        # divisible by collect_drones (per-drone row-group sampling).
        use_ring = (
            use_fused and dense
            and ring_capacity <= 4 * push_size
            and args.batch_size % args.collect_drones == 0)
        engine_name = "jnp"
        if use_fused:
            engine_name = "fused-pallas-ring" if use_ring else "fused-pallas"
        hist_ctx = (use_ring, use_fused)
        rng_rounds, actor_rng_rounds = rng_rounds_from_args(args)
        if (rng_rounds, actor_rng_rounds) != (20, None) and not use_fused:
            logger.warning("--fast_rng only affects the fused engines; "
                           "the jnp engine always uses jax.random")
            rng_rounds, actor_rng_rounds = 20, None
        if actor_rng_rounds is not None and use_fused and not use_ring \
                and not dense:
            logger.warning(
                "--fast_rng actor is a no-op on the fused (conv-XLA-"
                "actor) engine: the actor runs in jax.random outside the "
                "kernel; env uniforms stay at the parity 20 rounds")
        logger.info("Engine: %s", engine_name)
        if use_fused and not use_ring:
            # Tell the user WHY the fastest engine was skipped and what
            # crossing the gate costs (the perf cliff is ~25-35% obs/s
            # at the flagship shape — PERF.md "Where a step goes now").
            logger.info(
                "Ring engine skipped (%s); the fused engine is typically "
                "~25-35%% slower at large env batches",
                "; ".join(ring_skip_reasons(
                    dense, ring_capacity, push_size, args.batch_size,
                    args.collect_drones)))
        if use_ring:
            # Ring engine: the replay ring is the kernel's obs buffer.
            # bf16 obs storage halves the kernel's ring write (+3-7%
            # obs/s measured, PERF.md); env transitions stay bit-exact
            # (the ring only feeds the actor/learner matmuls, which
            # round to bf16 on the MXU anyway).
            ring_columns = ring_capacity // args.collect_drones
            tick = build_train_step_ring(
                agent, env_params, args.num_envs, ring_columns,
                args.batch_size, args.reset_env_every,
                rng_rounds=rng_rounds,
                actor_rng_rounds=actor_rng_rounds,
                collect_drones=args.collect_drones)
            carry = init_ring_carry(
                agent, env_params, args.num_envs, ring_columns, rng,
                obs_dtype=jnp.dtype(args.ring_obs_dtype),
                collect_drones=args.collect_drones,
                batch_size=args.batch_size)
            state0 = None
        elif use_fused:
            from dronerl_tpu.ops import fused_tick

            buffer = replay.StreamReplay(
                capacity=max(capacity, 2 * push_size),
                batch_size=args.batch_size, stride=push_size)
            bstate = buffer.init(
                {key: template[key] for key in
                 ("obs", "actions", "rewards", "dones")})
            # Dense nets (and conv nets under --conv_matmul): actor +
            # reset fused in-kernel. Other conv nets: fused env kernel
            # with the conv actor in XLA (layout fallbacks in
            # DQN.q_values_t / train_step_t).
            if dense:
                tick = build_train_step_full(
                    agent, buffer, env_params, args.num_envs,
                    args.collect_drones, args.reset_env_every,
                    rng_rounds=rng_rounds,
                    actor_rng_rounds=actor_rng_rounds)
            else:
                tick = build_train_step_fused(
                    agent, buffer, env_params, args.num_envs,
                    args.collect_drones, args.reset_env_every,
                    rng_rounds=rng_rounds)
            state0 = fused_tick.to_tstate(env_states)
            obs0 = obs.reshape(
                args.num_envs, args.collect_drones * agent.obs_dim).T
        else:
            buffer = replay.ReplayBuffer(
                capacity=capacity, batch_size=args.batch_size,
                uniform_pushes=True)
            bstate = buffer.init(template)
            tick = build_train_step(
                agent, buffer, env_params, args.num_envs,
                args.collect_drones, args.reset_env_every)
            state0 = env_states
            obs0 = obs.reshape(
                args.num_envs, args.collect_drones, agent.obs_dim)

        @jax.jit
        def run_chunk(carry, length_dummy):
            return jax.lax.scan(tick, carry, length_dummy)

        if state0 is not None:
            carry = (rng, state0, obs0, ag_state, bstate, jnp.array(0))
    if warm_params is not None:
        # Install the loaded weights into online + target nets; optimizer
        # state and ε stay fresh (matching the reference's warm start,
        # which rebuilds a fresh Adam around the loaded network).
        params = jax.tree.map(jnp.asarray, warm_params)
        carry = (*carry[:-3],
                 agent.state_with_params(carry[-3], params),
                 *carry[-2:])
    if args.resume_from:
        from dronerl_tpu.interop import train_state_io

        carry = train_state_io.restore(args.resume_from, carry)
        logger.info("Resumed training state from %s (step %s)",
                    args.resume_from, int(carry[-1]))

    num_chunks = math.ceil(args.num_steps / scan_steps)
    dummy = jnp.zeros((scan_steps,))

    if args.profile:
        profile_dir = os.path.join(run_dir, "profile")
        carry, _ = run_chunk(carry, dummy)  # warm-up/compile outside trace
        jax.block_until_ready(carry)
        jax.profiler.start_trace(profile_dir)

    ts = timer()
    rewards = None
    for chunk in range(num_chunks):
        if args.eval_while_training and chunk > 0:
            step = chunk * scan_steps
            (emean, estd), (rmean, rstd) = evaluate(args, agent, carry[-3])
            logger.info(
                "eval @ step %s: agent %.3f ± %.3f | random %.3f ± %.3f",
                f"{step:,}", emean, estd, rmean, rstd)
            metrics_logger.log_scalars(
                {"eval_reward": emean, "random_reward": rmean}, step=step)
        carry, (rewards, epsilons, losses) = run_chunk(carry, dummy)
        if log_metrics:
            # Per-chunk training curves (the reference logs ε + rewards
            # between chunks, reference: train_jax.py:226-227,257-266);
            # we also surface the TD loss the scan used to discard.
            # Warm-up ticks (buffer not yet sampleable) emit
            # NO_TRAIN_LOSS (negative; MSE is never negative), so the
            # mask is explicit — a genuine 0.0 loss is kept, and an
            # all-warm-up chunk skips the td_loss scalar entirely
            # instead of logging NaN to the sink. ``~(flat < 0)`` keeps
            # NaN losses in the mean (NaN < 0 is False): a diverged run
            # logs a NaN td_loss and a warning, never silence.
            flat = jnp.ravel(losses)
            trained = ~(flat < 0.0)
            n_trained = int(jnp.sum(trained))
            scalars = {
                "train_reward": float(jnp.mean(rewards)),
                "epsilon": float(jnp.ravel(epsilons)[-1]),
            }
            if n_trained:
                scalars["td_loss"] = float(
                    jnp.sum(jnp.where(trained, flat, 0.0)) / n_trained)
                if not math.isfinite(scalars["td_loss"]):
                    logger.warning(
                        "non-finite TD loss in chunk %d (training has "
                        "diverged?)", chunk)
            metrics_logger.log_scalars(
                scalars, step=(chunk + 1) * scan_steps)
            if args.log_histograms and hist_ctx is not None:
                log_chunk_histograms(
                    metrics_logger, agent, carry, losses, *hist_ctx,
                    step=(chunk + 1) * scan_steps)
    # Hard host sync: a scalar readback is the only reliable completion
    # barrier on tunneled backends (block_until_ready may return early,
    # silently inflating the reported obs/s).
    float(jnp.sum(rewards[-1]))
    elapsed = timer() - ts

    if args.profile:
        jax.profiler.stop_trace()
        logger.info("Profiler trace written under %s", profile_dir)

    total_steps = num_chunks * scan_steps
    obs_per_sec = args.num_envs * total_steps / elapsed
    metrics = {"obs_per_sec": obs_per_sec, "time_taken": elapsed}
    logger.info(
        "Trained %s steps × %s envs in %.2fs → %s obs/s",
        f"{total_steps:,}", f"{args.num_envs:,}", elapsed,
        f"{obs_per_sec:,.0f}")

    ag_state = carry[-3]
    if args.inspect_memory:
        bstate = carry[-2]
        if isinstance(bstate, replay.ReplayState):
            # StreamReplay stores feature-major (slots on the last axis),
            # ReplayBuffer row-major — tell the inspector which.
            replay.inspect_memory(bstate, printer=logger.info,
                                  slot_axis=-1 if use_fused else 0)
        else:
            logger.warning("--inspect_memory: the ring engine keeps no "
                           "ReplayState (observations live in the aliased "
                           "kernel ring); use --engine fused or jnp")
    if args.save_final_checkpoint:
        jax_path = os.path.join(
            run_dir, f"agent_{args.num_steps}_steps_jax.safetensors")
        torch_path = os.path.join(
            run_dir, f"agent_{args.num_steps}_steps_torch.safetensors")
        agent.save(jax_path, ag_state)
        agent.save_as_torch(torch_path, ag_state)
        logger.info("Saved checkpoints: %s, %s", jax_path, torch_path)
        if run:
            import wandb

            artifact = wandb.Artifact(
                name=f"checkpoint_{args.num_steps}_steps", type="model")
            artifact.add_file(local_path=jax_path)
            artifact.add_file(local_path=torch_path)
            run.log_artifact(artifact)

    if args.save_train_state:
        from dronerl_tpu.interop import train_state_io

        state_path = os.path.join(run_dir, "train_state.msgpack")
        train_state_io.save(state_path, carry)
        logger.info("Saved full training state to %s", state_path)

    if not args.skip_final_eval:
        (emean, estd), (rmean, rstd) = evaluate(args, agent, ag_state)
        metrics["eval_reward_mean"] = emean
        metrics["eval_reward_std"] = estd
        logger.info(
            "Final eval: agent %.3f ± %.3f | random %.3f ± %.3f",
            emean, estd, rmean, rstd)
        metrics_logger.log_scalars(
            {"eval_reward": emean, "random_reward": rmean},
            step=args.num_steps)

    if args.render_video:
        from dronerl_tpu.render.video import render_policy_video

        video_path = os.path.join(
            run_dir, f"training_{args.num_steps}_steps.mp4")
        render_policy_video(
            env_params, agent, ag_state, video_path,
            num_steps=args.render_video_steps)
        logger.info("Rendered video: %s", video_path)
        if run:
            import wandb

            run.log({"eval_video": wandb.Video(video_path, format="mp4")},
                    step=args.num_steps)

    with open(os.path.join(run_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    metrics_logger.close()
    if run:
        run.finish()
    return metrics


def parse_conv_layers(value: str):
    try:
        layers = json.loads(value)
    except json.JSONDecodeError:
        try:
            layers = ast.literal_eval(value)
        except (SyntaxError, ValueError):
            raise argparse.ArgumentTypeError(
                f"Invalid format for conv_layers: {value}")
    if isinstance(layers, dict):
        return (layers,)
    return tuple(layers)


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    # env
    p.add_argument("--n_drones", type=int, default=4)
    p.add_argument("--grid_size", type=int, default=9)
    p.add_argument("--window_radius", type=int, default=3)
    p.add_argument("--wrapper", choices=["window", "global"], default="window")
    p.add_argument("--packets_factor", type=int, default=3)
    p.add_argument("--dropzones_factor", type=int, default=2)
    p.add_argument("--stations_factor", type=int, default=2)
    p.add_argument("--skyscrapers_factor", type=int, default=3)
    p.add_argument("--num_envs", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    # training
    p.add_argument("--num_steps", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--memory_size", type=int, default=100_000)
    p.add_argument("--epsilon_start", type=float, default=1.0)
    p.add_argument("--epsilon_decay", type=float, default=None)
    p.add_argument("--epsilon_decay_half_life_fraction", type=float, default=0.2)
    p.add_argument("--epsilon_end", type=float, default=0.01)
    p.add_argument("--epsilon_decay_every", type=int, default=5)
    p.add_argument("--target_update_interval", type=int, default=10)
    p.add_argument("--gamma", type=float, default=0.9)
    p.add_argument("--reset_env_every", type=int, default=100)
    p.add_argument("--tau", type=float, default=1.0)
    p.add_argument("--collect_drones", type=int, default=1,
                   help="Learn from the first k drones of every env")
    p.add_argument("--max_scan_steps", type=int, default=100_000)
    p.add_argument(
        "--engine", choices=["auto", "fused", "jnp"], default="auto",
        help="Training engine: fused Pallas step+observe kernel (TPU, "
             "dense nets) or the pure-jnp path; auto picks fused when "
             "supported")
    p.add_argument(
        "--ring_obs_dtype", choices=["bfloat16", "float32"],
        default="bfloat16",
        help="Ring-engine observation storage dtype. bf16 halves the "
             "per-step HBM obs write; actor/learner still compute in f32")
    p.add_argument(
        "--fast_rng", nargs="?", const="full", default="off",
        choices=["off", "actor", "full"],
        help="Fused engines only: reduced-round Threefry-2x32-8. "
             "'full' (also the bare-flag value) runs ALL in-kernel "
             "uniforms at 8 rounds — +18%% obs/s, env transitions no "
             "longer bit-identical to the reference at fixed seeds. "
             "'actor' is the hybrid: only the ε-greedy actor rows drop "
             "to 8 rounds while the 162 env cell-uniforms stay at the "
             "full 20 — env transitions stay bit-exact, measured +1.5%% "
             "(the actor rows are ~5/167 of the threefry work; see "
             "PERF.md 'Hybrid RNG')")
    p.add_argument("--save_final_checkpoint", action="store_true")
    p.add_argument(
        "--load_from_checkpoint", type=str, default=None,
        help="Warm-start the Q-network (online + target) from a "
             "safetensors checkpoint; network topology is taken from the "
             "checkpoint metadata")
    p.add_argument(
        "--tensorboard_dir", type=str, default=None,
        help="Write per-chunk training curves (reward/ε/TD loss) and "
             "eval points to TensorBoard under this directory")
    p.add_argument(
        "--log_histograms", action=argparse.BooleanOptionalAction,
        default=True,
        help="With an active metrics sink, also log per-chunk q-value / "
             "TD-loss / replay-action histograms (the reference's "
             "TensorBoard histograms, torch_impl/agents/dqn.py:371-374)")
    p.add_argument("--save_train_state", action="store_true",
                   help="Persist full training state (params/opt/ε/buffer/envs)")
    p.add_argument("--resume_from", type=str, default=None)
    p.add_argument("--use_sharding", action="store_true",
                   help="Shard envs across all devices (mesh + shard_map)")
    p.add_argument("--coordinator_address", type=str, default=None,
                   help="host:port of process 0 for multi-host runs")
    p.add_argument("--num_processes", type=int, default=None,
                   help="total process count for multi-host runs")
    p.add_argument("--process_id", type=int, default=None,
                   help="this process's index for multi-host runs")
    p.add_argument("--run_dir", type=str, default=None)
    p.add_argument("--jax_cache_dir", type=str, default="./jax_cache")
    p.add_argument("--profile", action="store_true")
    p.add_argument("--inspect_memory", action="store_true",
                   help="Dump replay-buffer diagnostics (action/reward/done "
                        "distributions, top states) after training")
    # model
    p.add_argument("--network_type", choices=["dense", "conv"], default="dense")
    p.add_argument("--hidden_layers", nargs="+", type=int, default=(16, 16))
    p.add_argument(
        "--conv_layers", type=parse_conv_layers,
        default='[{"kernel_size": 3, "out_channels": 8, "padding": 1, "stride": 1}]')
    p.add_argument("--conv_dense_layers", nargs="+", type=int, default=())
    p.add_argument("--conv_matmul", action="store_true",
                   help="compute conv layers as im2col weight matrices "
                        "(ops/conv2mat.py): same parameters/checkpoints, "
                        "float sums in matmul order; unlocks the in-kernel "
                        "conv actor (ring engine) for conv networks")
    # rewards
    p.add_argument("--pickup_reward", type=float, default=0.0)
    p.add_argument("--delivery_reward", type=float, default=1.0)
    p.add_argument("--crash_reward", type=float, default=-1.0)
    p.add_argument("--charge_reward", type=float, default=-0.1)
    # eval
    p.add_argument("--eval_n_drones", type=int, default=None)
    p.add_argument("--eval_grid_size", type=int, default=None)
    p.add_argument("--eval_seed", type=int, default=0)
    p.add_argument("--num_eval_steps", type=int, default=10_000)
    p.add_argument("--num_evals", type=int, default=5)
    p.add_argument("--eval_while_training", action="store_true")
    p.add_argument("--skip_final_eval", action="store_true")
    # video
    p.add_argument("--render_video", action="store_true")
    p.add_argument("--render_video_steps", type=int, default=200)
    # W&B
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--wandb_project", type=str, default="dronerl-tpu")
    p.add_argument("--wandb_entity", type=str, default=None)
    p.add_argument("--wandb_group", type=str, default=None)
    args = p.parse_args(argv)

    if isinstance(args.conv_layers, str):
        args.conv_layers = parse_conv_layers(args.conv_layers)
    if args.num_envs <= 0:
        raise ValueError("num_envs must be >= 1")
    if args.num_steps <= 0:
        raise ValueError("num_steps must be >= 1")
    if args.collect_drones < 1 or args.collect_drones > args.n_drones:
        raise ValueError("collect_drones must be in [1, n_drones]")
    if args.use_sharding and args.num_envs % jax.device_count() != 0:
        raise ValueError(
            f"num_envs ({args.num_envs}) must be divisible by the device "
            f"count ({jax.device_count()}) when sharding")
    return args


def main(argv=None):
    args = parse_args(argv)
    return train(args)


if __name__ == "__main__":
    main()
