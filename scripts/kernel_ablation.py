"""Attribute ring-engine step time to kernel sections by ablation.

The tunneled backend rejects jax.profiler traces, so sections are timed
by subtraction: each variant monkey-patches one kernel section into a
no-op (breaking semantics, NOT parity-safe — measurement only) and
re-times the full training step. baseline − variant ≈ section cost.

Variants:
  baseline     full training step (parity kernel)
  kernel_only  scan of just the fused kernel call (no replay/TD outside)
  no_obs       window encoder replaced by constant rows
  no_spawn     respawn selection (ground + air pickers) skipped
  no_actor     in-kernel Q forward replaced by zeros
  rng8         8-round threefry (the fast_rng mode, for the rounds slope)

Usage: PYTHONPATH=. python scripts/kernel_ablation.py [--envs 65536]
"""

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp

from dronerl_tpu.agents.dqn import DQN, DQNConfig
from dronerl_tpu.env.types import EnvParams
from dronerl_tpu.ops import fused_tick
from dronerl_tpu.train import (
    build_train_step_ring, init_ring_carry, setup_compilation_cache)

ENV = EnvParams(grid_size=9, n_drones=4, window_radius=3)
CFG = DQNConfig(network_type="dense", hidden_layers=(16, 16),
                epsilon_decay_every=5, target_update_interval=10, gamma=0.9)


def time_tick(tick, carry, steps, repeats):
    @jax.jit
    def run(c, d):
        return jax.lax.scan(tick, c, d)

    d = jnp.zeros((steps,))
    carry, ys = run(carry, d)
    jax.tree.map(lambda a: float(jnp.sum(a.astype(jnp.float32))), ys[0])
    t0 = time.perf_counter()
    for _ in range(repeats):
        carry, ys = run(carry, d)
    jax.tree.map(lambda a: float(jnp.sum(a.astype(jnp.float32))), ys[0])
    return (time.perf_counter() - t0) / (steps * repeats)


def build(num_envs, rng_rounds=20):
    agent = DQN(CFG, ENV)
    capacity = max(-(-100_000 // num_envs) * num_envs, 2 * num_envs)
    tick = build_train_step_ring(
        agent, ENV, num_envs, capacity, batch_size=8, reset_env_every=100,
        rng_rounds=rng_rounds)
    carry = init_ring_carry(agent, ENV, num_envs, capacity,
                            jax.random.PRNGKey(0), obs_dtype=jnp.bfloat16,
                            batch_size=8)
    return agent, tick, carry, capacity


def kernel_only_tick(agent, num_envs, capacity):
    nb = capacity // num_envs

    def tick(carry, _):
        rng, (tstate, ring), rings, ag_state, _u, step = carry
        rng, step_key = jax.random.split(rng, 2)
        read_slot = (step % nb) * num_envs
        write_slot = ((step + 1) % nb) * num_envs
        tstate, rewards_t, dones_t, actions_t, ring = (
            fused_tick.full_tick_fused_ring(
                step_key, tstate, ring, read_slot, write_slot,
                ag_state.params, ag_state.epsilon,
                step % 100 == 0, ENV, 1, False))
        carry = (rng, (tstate, ring), rings, ag_state, _u, step + 1)
        return carry, (rewards_t[0], ag_state.epsilon, 0.0)

    return tick


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--envs", type=int, default=65536)
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--repeats", type=int, default=4)
    p.add_argument("--variants", nargs="+",
                   default=["baseline", "kernel_only", "no_obs", "no_spawn",
                            "no_actor", "rng8"],
                   help="also: no_physics (move-only physics), rng1 "
                        "(1-round threefry), floor (no_physics + no_obs + "
                        "no_spawn + rng1: pure block-I/O/pipeline floor)")
    args = p.parse_args()
    setup_compilation_cache("/root/repo/.jax_cache_bench")

    results = {}
    for variant in args.variants:
        orig_encode = fused_tick._encode_obs
        orig_ground = fused_tick._GridOps.ground_respawn
        orig_air = fused_tick._GridOps.air_spawn
        orig_q = fused_tick._q_forward
        orig_phys = fused_tick._physics_and_observe
        orig_pread = fused_tick._GridOps.point_read
        orig_masks = fused_tick._GridOps.last_writer_masks
        orig_train = DQN.train_step_t
        try:
            rng_rounds = {"rng8": 8, "rng4": 4, "floor": 4}.get(variant, 20)

            def fake_encode(ops, collect, ground, ax, ay, carry, charge):
                row = charge[0:1] * 0.0
                w = 2 * ops.params.window_radius + 1
                return [row] * (collect * w * w * 6)

            def fake_physics(ops, collect, u_ground, u_air, ground,
                             ax, ay, carrying, charge, actions,
                             encode=fused_tick._encode_obs):
                # move-only physics: keeps every interface live so Mosaic
                # cannot dead-code the block I/O
                nx = jnp.clip(ax + actions % 2, 0, ops.g - 1)
                ny = jnp.clip(ay + actions // 4, 0, ops.g - 1)
                rewards = charge * 0.0
                dones = rewards > 1.0
                obs_rows = encode(ops, collect, ground, nx, ny,
                                  carrying, charge)
                return (ground, nx, ny, carrying, charge, rewards, dones,
                        obs_rows)

            if variant == "no_obs":
                fused_tick._encode_obs = fake_encode
            elif variant == "no_spawn":
                fused_tick._GridOps.ground_respawn = (
                    lambda self, ground, u, fills: ground)
                fused_tick._GridOps.air_spawn = (
                    lambda self, u, ax, ay, excl: (jnp.abs(ax), jnp.abs(ay)))
            elif variant == "no_actor":
                fused_tick._q_forward = lambda obs, refs: (
                    obs[0:5] * 0.0)
            elif variant == "no_physics":
                fused_tick._physics_and_observe = fake_physics
            elif variant == "no_td":
                DQN.train_step_t = lambda self, ag, batch, **kw: (ag, 0.0)
            elif variant == "no_pointreads":
                fused_tick._GridOps.point_read = (
                    lambda self, field, idx: field[0:1] * 0.0)
            elif variant == "no_masks":
                fused_tick._GridOps.last_writer_masks = (
                    lambda self, rows, cols, flags_list:
                    [self.cell == -1 for _ in flags_list])
            elif variant == "floor":
                fused_tick._encode_obs = fake_encode
                fused_tick._physics_and_observe = functools.partial(
                    fake_physics, encode=fake_encode)
                fused_tick._GridOps.ground_respawn = (
                    lambda self, ground, u, fills: ground)
                fused_tick._GridOps.air_spawn = (
                    lambda self, u, ax, ay, excl: (jnp.abs(ax), jnp.abs(ay)))

            # The monkeypatched kernel section is NOT a jit static key:
            # without dropping traces, every same-shape variant would
            # silently reuse the previous variant's compiled program and
            # report a bogus ≈0 section cost (round-5 lesson — the
            # round-4 session's multi-variant run hit exactly this).
            jax.clear_caches()
            agent, tick, carry, capacity = build(args.envs, rng_rounds)
            if variant == "kernel_only":
                tick = kernel_only_tick(agent, args.envs, capacity)
            sec = time_tick(tick, carry, args.steps, args.repeats)
            results[variant] = round(sec * 1e6, 1)
            print(json.dumps({"variant": variant,
                              "us_per_step": results[variant],
                              "obs_per_sec": round(args.envs / sec, 1)}),
                  flush=True)
        finally:
            fused_tick._encode_obs = orig_encode
            fused_tick._GridOps.ground_respawn = orig_ground
            fused_tick._GridOps.air_spawn = orig_air
            fused_tick._q_forward = orig_q
            fused_tick._physics_and_observe = orig_phys
            fused_tick._GridOps.point_read = orig_pread
            fused_tick._GridOps.last_writer_masks = orig_masks
            DQN.train_step_t = orig_train

    if "baseline" in results:
        base = results["baseline"]
        for variant, us in results.items():
            if variant not in ("baseline",):
                print(f"# {variant}: section ≈ {base - us:+.1f} µs")


if __name__ == "__main__":
    main()
