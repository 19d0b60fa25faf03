"""Fused learner kernel vs the optax/train_step_t reference path."""

import jax
import jax.numpy as jnp
import numpy as np

from dronerl_tpu.agents.dqn import DQN, DQNConfig
from dronerl_tpu.env.types import EnvParams
from dronerl_tpu.ops.learner_kernel import learn_tick_fused


def test_learner_kernel_matches_reference_path():
    params = EnvParams(grid_size=9, n_drones=4)
    config = DQNConfig(hidden_layers=(16, 16), epsilon_decay=0.99,
                       epsilon_end=0.01, target_update_interval=5,
                       gamma=0.9)
    agent = DQN(config, params)
    rng = jax.random.PRNGKey(0)
    st_ref = agent.init_state(rng)
    st_k = st_ref

    for t in range(6):
        rng, k1, k2 = jax.random.split(rng, 3)
        batch = {
            "obs": jax.random.uniform(k1, (agent.obs_dim, 8)),
            "next_obs": jax.random.uniform(k2, (agent.obs_dim, 8)),
            "actions": jax.random.randint(k1, (8,), 0, 5),
            "rewards": jax.random.normal(k2, (8,)),
            "dones": (jax.random.uniform(k1, (8,)) < 0.2).astype(
                jnp.float32),
        }
        learn = jnp.array(t != 2)   # skip one update (gating must hold)
        sync = jnp.array(t % 2 == 0)
        dec = jnp.array(t % 3 == 0)
        if bool(learn):
            st_ref, _ = agent.train_step_t(st_ref, batch)
        if bool(sync):
            st_ref = agent.update_target(st_ref)
        if bool(dec):
            st_ref = agent.decay_epsilon(st_ref)
        st_k = learn_tick_fused(
            batch, st_k, learn, sync, dec, config, interpret=True)
        for name in ("params", "target_params"):
            for pa, pb in zip(jax.tree.leaves(getattr(st_ref, name)),
                              jax.tree.leaves(getattr(st_k, name))):
                np.testing.assert_allclose(
                    np.asarray(pa), np.asarray(pb), rtol=2e-4, atol=1e-6,
                    err_msg=f"t={t} {name}")
        np.testing.assert_allclose(
            float(st_ref.epsilon), float(st_k.epsilon), rtol=1e-6)
        assert int(st_ref.opt_state[0].count) == int(
            st_k.opt_state[0].count), t
