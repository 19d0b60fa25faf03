"""Ablation microbenchmark: where does the fused train step spend time?

Times scan loops of increasing composition on the current backend:
  1. env.step only
  2. env.step + observe
  3. env.step + observe + act
  4. full train tick (replay + TD update + target/eps/reset conds)
"""

import time

import jax
import jax.numpy as jnp

from dronerl_tpu import replay
from dronerl_tpu.agents.dqn import DQN, DQNConfig
from dronerl_tpu.constants import NUM_ACTIONS
from dronerl_tpu.env import core as env_core
from dronerl_tpu.env.types import EnvParams
from dronerl_tpu.train import build_train_step

NUM_ENVS = 1024
STEPS = 500


def bench(name, make_carry, tick):
    @jax.jit
    def run(carry):
        return jax.lax.scan(tick, carry, length=STEPS)

    carry = make_carry()
    out = run(carry)
    jax.block_until_ready(out)
    dt = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        out = run(carry)
        jax.block_until_ready(out)
        dt = min(dt, time.perf_counter() - t0)
    print(f"{name:30s} {1e6 * dt / STEPS:9.1f} us/step "
          f"{NUM_ENVS * STEPS / dt:12,.0f} obs/s")


def main():
    env_params = EnvParams(grid_size=9, n_drones=4)
    agent = DQN(DQNConfig(hidden_layers=(16, 16), epsilon_decay_every=5,
                          target_update_interval=10), env_params)
    rng = jax.random.PRNGKey(0)
    env_states = env_core.reset_batch(rng, env_params, NUM_ENVS)

    def carry_env():
        return (rng, env_states)

    def tick_env(carry, _):
        r, st = carry
        r, k = jax.random.split(r)
        actions = jax.random.randint(k, (NUM_ENVS, env_params.n_drones), 0, 5)
        keys = jax.random.split(k, NUM_ENVS)
        st, rew, dn = env_core.step_batch(keys, st, actions, env_params)
        return (r, st), rew[:, 0]

    bench("env.step", carry_env, tick_env)

    def tick_env_obs(carry, _):
        (r, st), rew = tick_env(carry, None)
        obs = env_core.observe_batch(st, env_params)
        return (r, st), obs[:, 0, 0, 0, 0]

    bench("env.step + observe", carry_env, tick_env_obs)

    ag_state = agent.init_state(rng)

    def carry_act():
        obs = env_core.observe_batch(env_states, env_params, 1)
        return (rng, env_states, obs.reshape(NUM_ENVS, agent.obs_dim))

    def tick_act(carry, _):
        r, st, obs = carry
        r, k = jax.random.split(r)
        actions = jax.random.randint(k, (NUM_ENVS, env_params.n_drones), 0, 5)
        dqn = agent.act(k, obs, ag_state)
        actions = actions.at[:, 0].set(dqn)
        keys = jax.random.split(k, NUM_ENVS)
        st, rew, dn = env_core.step_batch(keys, st, actions, env_params)
        obs = env_core.observe_batch(st, env_params, 1).reshape(
            NUM_ENVS, agent.obs_dim)
        return (r, st, obs), rew[:, 0]

    bench("env.step + observe + act", carry_act, tick_act)

    buffer = replay.ReplayBuffer(capacity=100_000, batch_size=8)
    template = {
        "obs": jnp.zeros((agent.obs_dim,), jnp.float32),
        "actions": jnp.array(0, jnp.int32),
        "rewards": jnp.array(0.0, jnp.float32),
        "next_obs": jnp.zeros((agent.obs_dim,), jnp.float32),
        "dones": jnp.array(False, jnp.bool_),
    }
    tick_full = build_train_step(agent, buffer, env_params, NUM_ENVS, 1, 100)

    def carry_full():
        obs = env_core.observe_batch(env_states, env_params, 1)
        return (rng, env_states,
                obs.reshape(NUM_ENVS, 1, agent.obs_dim),
                agent.init_state(rng), buffer.init(template), jnp.array(0))

    bench("full train tick", carry_full, tick_full)


if __name__ == "__main__":
    main()
