"""Microbenchmark: isolate the observation-encoder and act costs.

The ablation (scripts/ablate_step.py) shows the fused tick is dominated by
whatever runs between env.step and the replay write once the observation
tensor is actually materialized (it is DCE'd in the step-only variants).
This script times each candidate in a scan that CARRIES its output, so
nothing is eliminated:

  1. act only            (forward pass + ε-greedy on a carried obs)
  2. obs: einsum crop    (current crop_windows formulation)
  3. obs: vmapped dynamic_slice crop
  4. obs: flat one-hot gather-matmul over channels
  5. obs: full encoder (observe_batch) as shipped
"""

import time

import jax
import jax.numpy as jnp

from dronerl_tpu.agents.dqn import DQN, DQNConfig
from dronerl_tpu.env import core as env_core
from dronerl_tpu.env.types import EnvParams
from dronerl_tpu.ops.window import crop_windows

NUM_ENVS = 1024
STEPS = 500


def bench(name, carry, tick):
    @jax.jit
    def run(c):
        return jax.lax.scan(tick, c, length=STEPS)

    out = run(carry)
    jax.block_until_ready(out)
    dt = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        out = run(carry)
        jax.block_until_ready(out)
        dt = min(dt, time.perf_counter() - t0)
    print(f"{name:42s} {1e6 * dt / STEPS:9.1f} us/step")
    return dt


def main():
    env_params = EnvParams(grid_size=9, n_drones=4)
    agent = DQN(DQNConfig(hidden_layers=(16, 16)), env_params)
    rng = jax.random.PRNGKey(0)
    states = env_core.reset_batch(rng, env_params, NUM_ENVS)
    ag_state = agent.init_state(rng)
    obs0 = env_core.observe_batch(states, env_params, 1).reshape(
        NUM_ENVS, agent.obs_dim)
    r = env_params.window_radius

    # 1. act only: carry obs, fold key, one forward + eps-greedy per step.
    def tick_act(carry, _):
        key, obs = carry
        key = jax.random.fold_in(key, 1)
        a = agent.act(key, obs, ag_state)
        obs = obs + a.sum() * 0.0  # keep carry alive without changing it
        return (key, obs), a[0]

    bench("act (dense 16,16 fwd + eps-greedy)", (rng, obs0), tick_act)

    # 1b. greedy forward only — no PRNG work.
    def tick_fwd(carry, _):
        obs = carry
        q = agent.q_values(ag_state.params, obs)
        a = jnp.argmax(q, axis=-1)
        obs = obs + a.sum() * 0.0
        return obs, a[0]

    bench("forward+argmax only", obs0, tick_fwd)

    # 1c. PRNG only — fold_in + split + uniform + randint, no forward.
    def tick_rng(carry, _):
        key, obs = carry
        key = jax.random.fold_in(key, 1)
        k1, k2 = jax.random.split(key)
        explore = jax.random.uniform(k1, (NUM_ENVS,)) < 0.5
        racts = jax.random.randint(k2, (NUM_ENVS,), 0, 5)
        a = jnp.where(explore, racts, 0)
        obs = obs + a.sum() * 0.0
        return (key, obs), a[0]

    bench("eps-greedy PRNG only", (rng, obs0), tick_rng)

    padded = jax.vmap(
        lambda g: jnp.pad(g, r, constant_values=2))(states.ground)
    cx = states.air_x[:, :1] + r
    cy = states.air_y[:, :1] + r

    # 2. einsum crop (current formulation), carried.
    def tick_einsum(carry, _):
        p, x, y = carry
        w = jax.vmap(crop_windows, in_axes=(0, 0, 0, None))(p, x, y, r)
        x = x + w[:, :, 0, 0].astype(jnp.int32) * 0
        return (p, x, y), w[0, 0, 0, 0]

    bench("crop: einsum (current)", (padded, cx, cy), tick_einsum)

    # 3. vmapped dynamic_slice crop.
    def ds_crop(p, x, y):
        def one(xc, yc):
            return jax.lax.dynamic_slice(
                p, (yc - r, xc - r), (2 * r + 1, 2 * r + 1))
        return jax.vmap(one)(x, y)

    def tick_ds(carry, _):
        p, x, y = carry
        w = jax.vmap(ds_crop)(p, x, y)
        x = x + w[:, :, 0, 0].astype(jnp.int32) * 0
        return (p, x, y), w[0, 0, 0, 0]

    bench("crop: vmapped dynamic_slice", (padded, cx, cy), tick_ds)

    # 4. flat gather: padded.reshape(E, P*P)[e, flat_idx]
    side = padded.shape[-1]
    flat = padded.reshape(NUM_ENVS, side * side)
    span = jnp.arange(-r, r + 1)

    def tick_gather(carry, _):
        f, x, y = carry
        rows = y[:, :, None, None] + span[None, None, :, None]
        cols = x[:, :, None, None] + span[None, None, None, :]
        idx = (rows * side + cols).reshape(NUM_ENVS, -1)
        w = jnp.take_along_axis(f, idx, axis=1)
        x = x + w[:, :1].astype(jnp.int32) * 0
        return (f, x, y), w[0, 0]

    bench("crop: flat take_along_axis", (flat, cx, cy), tick_gather)

    # 5. full shipped encoder, carried.
    def tick_obs(carry, _):
        key, sts, o = carry
        key = jax.random.fold_in(key, 1)
        o = env_core.observe_batch(sts, env_params, 1).reshape(
            NUM_ENVS, agent.obs_dim)
        return (key, sts, o), o[0, 0]

    bench("full observe_batch(limit=1)", (rng, states, obs0), tick_obs)

    # 6. obs + act together (the measured 500us combination).
    def tick_obs_act(carry, _):
        key, sts, o = carry
        key = jax.random.fold_in(key, 1)
        o = env_core.observe_batch(sts, env_params, 1).reshape(
            NUM_ENVS, agent.obs_dim)
        a = agent.act(key, o, ag_state)
        return (key, sts, o), a[0]

    bench("observe + act", (rng, states, obs0), tick_obs_act)


if __name__ == "__main__":
    main()
