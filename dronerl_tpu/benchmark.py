"""Multi-configuration benchmark harness with per-phase timing.

Capability mirror of the reference benchmark (reference:
torch_impl/benchmark.py:31-158): sweeps env configurations × drone counts
and reports steps/s with an act / env+obs / learn phase split. Phases are
timed as separately jitted scans (inside the fused trainer they overlap,
so the full-loop number is also reported and is the one that matters).

Run: PYTHONPATH=. python -m dronerl_tpu.benchmark [--steps 500]
"""

import argparse
import time
from typing import Dict

import jax
import jax.numpy as jnp

from dronerl_tpu import replay
from dronerl_tpu.agents.dqn import DQN, DQNConfig
from dronerl_tpu.constants import NUM_ACTIONS
from dronerl_tpu.env import core as env_core
from dronerl_tpu.env.types import EnvParams
from dronerl_tpu.train import build_train_step

CONFIGS: Dict[str, dict] = {
    "DronesOnly": dict(packets_factor=0, dropzones_factor=0,
                       stations_factor=0, skyscrapers_factor=0),
    "Default": dict(),
    "HighDensity": dict(packets_factor=4, dropzones_factor=3,
                        stations_factor=3, skyscrapers_factor=4),
}
DRONE_COUNTS = (4, 16, 64)
NUM_ENVS = 256


def _time_scan(tick, carry, steps: int) -> float:
    def run_fn(c):
        c, ys = jax.lax.scan(tick, c, length=steps)
        # scalar readback target: a host transfer is the only reliable
        # sync on tunneled backends (block_until_ready may return early)
        return c, jnp.sum(jax.tree.leaves(ys)[0].astype(jnp.float32))

    run = jax.jit(run_fn)
    carry, s = run(carry)
    float(s)
    t0 = time.perf_counter()
    _, s = run(carry)
    float(s)
    return time.perf_counter() - t0


def bench_config(name: str, overrides: dict, n_drones: int, steps: int,
                 num_envs: int = NUM_ENVS) -> dict:
    import math

    grid = int(math.ceil(math.sqrt(n_drones / 0.05)))
    params = EnvParams(grid_size=grid, n_drones=n_drones, **overrides)
    agent = DQN(DQNConfig(hidden_layers=(16, 16), epsilon_decay_every=5),
                params)
    rng = jax.random.PRNGKey(0)
    states = env_core.reset_batch(rng, params, num_envs)
    ag_state = agent.init_state(rng)

    # env phase: physics only
    def tick_env(carry, _):
        r, st = carry
        r, k = jax.random.split(r)
        a = jax.random.randint(k, (num_envs, n_drones), 0, NUM_ACTIONS)
        st, rew, _ = env_core.step_batch(
            jax.random.split(k, num_envs), st, a, params)
        return (r, st), rew[:, 0]

    env_t = _time_scan(tick_env, (rng, states), steps)

    # act phase: observe + forward
    obs0 = env_core.observe_batch(states, params, 1).reshape(
        num_envs, agent.obs_dim)

    def tick_act(carry, _):
        r, st, obs = carry
        r, k = jax.random.split(r)
        acts = agent.act(k, obs, ag_state)
        obs = env_core.observe_batch(st, params, 1).reshape(
            num_envs, agent.obs_dim)
        return (r, st, obs), acts[0]

    act_t = _time_scan(tick_act, (rng, states, obs0), steps)

    # learn phase: sample + TD update on a warm buffer
    buffer = replay.ReplayBuffer(capacity=4096, batch_size=64)
    template = {
        "obs": jnp.zeros((agent.obs_dim,), jnp.float32),
        "actions": jnp.array(0, jnp.int32),
        "rewards": jnp.array(0.0, jnp.float32),
        "next_obs": jnp.zeros((agent.obs_dim,), jnp.float32),
        "dones": jnp.array(False, jnp.bool_),
    }
    bstate = buffer.init(template)
    warm = {
        "obs": jnp.ones((4096, agent.obs_dim), jnp.float32),
        "actions": jnp.zeros((4096,), jnp.int32),
        "rewards": jnp.zeros((4096,), jnp.float32),
        "next_obs": jnp.ones((4096, agent.obs_dim), jnp.float32),
        "dones": jnp.zeros((4096,), jnp.bool_),
    }
    bstate = buffer.push_many(bstate, warm)

    def tick_learn(carry, _):
        r, ag = carry
        r, k = jax.random.split(r)
        batch = buffer.sample(k, bstate)
        batch = dict(batch, dones=batch["dones"].astype(jnp.float32))
        ag, loss = agent.train_step(ag, batch)
        return (r, ag), loss

    learn_t = _time_scan(tick_learn, (rng, ag_state), steps)

    # full training loop — the fused Pallas engine when available, else jnp
    from dronerl_tpu.train import (
        build_train_step_fused, fused_engine_supported)

    if fused_engine_supported(agent, params, num_envs):
        from dronerl_tpu.ops import fused_tick

        capacity = -(-10_000 // num_envs) * num_envs
        sbuf = replay.StreamReplay(
            capacity=max(capacity, 2 * num_envs), batch_size=64,
            stride=num_envs)
        stemplate = {k: template[k]
                     for k in ("obs", "actions", "rewards", "dones")}
        full_tick = build_train_step_fused(
            agent, sbuf, params, num_envs, 1, 100)
        carry = (rng, fused_tick.to_tstate(states),
                 env_core.observe_batch(states, params, 1).reshape(
                     num_envs, agent.obs_dim).T,
                 ag_state, sbuf.init(stemplate), jnp.array(0))
    else:
        full_buffer = replay.ReplayBuffer(
            capacity=-(-10_000 // num_envs) * num_envs, batch_size=64,
            uniform_pushes=True)
        full_tick = build_train_step(
            agent, full_buffer, params, num_envs, 1, 100)
        carry = (rng, states,
                 env_core.observe_batch(states, params, 1).reshape(
                     num_envs, 1, agent.obs_dim),
                 ag_state, full_buffer.init(template), jnp.array(0))
    full_t = _time_scan(full_tick, carry, steps)

    total_obs = num_envs * steps
    return {
        "config": name,
        "n_drones": n_drones,
        "grid": grid,
        "env_steps_per_s": total_obs / env_t,
        "act_steps_per_s": total_obs / act_t,
        "learn_steps_per_s": steps / learn_t,
        "fused_obs_per_s": total_obs / full_t,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--num_envs", type=int, default=NUM_ENVS)
    parser.add_argument("--configs", nargs="+", default=list(CONFIGS))
    parser.add_argument("--drone_counts", nargs="+", type=int,
                        default=list(DRONE_COUNTS))
    args = parser.parse_args()

    header = (f"{'config':<12} {'drones':>6} {'grid':>5} "
              f"{'env/s':>14} {'act/s':>14} {'learn it/s':>11} {'fused obs/s':>14}")
    print(header)
    print("-" * len(header))
    for name in args.configs:
        for n in args.drone_counts:
            row = bench_config(name, CONFIGS[name], n, args.steps,
                               args.num_envs)
            print(f"{row['config']:<12} {row['n_drones']:>6} {row['grid']:>5} "
                  f"{row['env_steps_per_s']:>14,.0f} "
                  f"{row['act_steps_per_s']:>14,.0f} "
                  f"{row['learn_steps_per_s']:>11,.0f} "
                  f"{row['fused_obs_per_s']:>14,.0f}")


if __name__ == "__main__":
    main()
