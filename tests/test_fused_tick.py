"""Equivalence of the transposed fused step+observe kernel and trainer.

The kernel runs under the Pallas interpreter on CPU here; the identical
code compiles for TPU in production (exercised by bench.py and the
trainer's auto engine).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dronerl_tpu import replay
from dronerl_tpu.agents.dqn import DQN, DQNConfig
from dronerl_tpu.env import core as env_core
from dronerl_tpu.env.types import EnvParams
from dronerl_tpu.ops import fused_tick


def test_tstate_roundtrip():
    params = EnvParams(grid_size=9, n_drones=4)
    states = env_core.reset_batch(jax.random.PRNGKey(0), params, 8)
    back = fused_tick.from_tstate(fused_tick.to_tstate(states), params)
    for field in ("ground", "air_x", "air_y", "carrying_package", "charge"):
        assert (np.asarray(getattr(states, field))
                == np.asarray(getattr(back, field))).all()


@pytest.mark.parametrize(
    "params,collect",
    [
        (EnvParams(grid_size=9, n_drones=4), 1),
        (EnvParams(grid_size=8, n_drones=3), 2),
        (EnvParams(grid_size=9, n_drones=4, window_radius=2), 1),
        # >128 cells: exercises the float spawn-picker fallback
        # (the integer-composite picker covers boards ≤ 128 cells)
        (EnvParams(grid_size=12, n_drones=4), 1),
        # full-grid observations (GridView semantics) in-kernel
        (EnvParams(grid_size=9, n_drones=4, wrapper="global"), 1),
        (EnvParams(grid_size=8, n_drones=3, wrapper="global"), 2),
    ],
    ids=["default", "collect2", "radius2", "biggrid", "global", "global2"],
)
@pytest.mark.slow
def test_tick_fused_matches_jnp_pipeline(params, collect):
    num_envs = 128
    rng = jax.random.PRNGKey(0)
    states = env_core.reset_batch(rng, params, num_envs)
    tstate = fused_tick.to_tstate(states)
    assert fused_tick.supports(params, num_envs)
    obs_dim = (
        params.obs_shape[0] * params.obs_shape[1] * params.obs_shape[2])
    for t in range(10):
        rng, act_key, step_key = jax.random.split(rng, 3)
        actions = jax.random.randint(
            act_key, (num_envs, params.n_drones), 0, 5)
        keys = jax.random.split(step_key, num_envs)
        st_ref, rew_ref, done_ref = env_core.step_batch(
            keys, states, actions, params)
        obs_ref = env_core.observe_batch(st_ref, params, collect).reshape(
            num_envs, collect * obs_dim)
        tstate, rew_t, done_t, obs_t = fused_tick.tick_fused(
            step_key, tstate, actions.T, params, collect, interpret=True)
        back = fused_tick.from_tstate(tstate, params)
        for field in ("ground", "air_x", "air_y", "carrying_package",
                      "charge"):
            assert (np.asarray(getattr(st_ref, field))
                    == np.asarray(getattr(back, field))).all(), (t, field)
        assert (np.asarray(rew_ref) == np.asarray(rew_t).T).all(), t
        assert (np.asarray(done_ref) == np.asarray(done_t).T).all(), t
        # Exact on every channel except the charge fraction, where XLA's
        # context-dependent divide-to-reciprocal rewrite allows 1 ULP
        # (see ops/fused_tick.py module docstring).
        ours = np.asarray(obs_t).T.reshape(num_envs, collect, -1, 6)
        ref = np.asarray(obs_ref).reshape(num_envs, collect, -1, 6)
        ch = np.arange(6) != 4
        assert (ref[..., ch] == ours[..., ch]).all(), t
        np.testing.assert_allclose(
            ref[..., 4], ours[..., 4], atol=1.3e-7, rtol=0,
            err_msg=f"step {t}")
        states = st_ref


class TestTransposedAgentPaths:
    def _agent(self):
        params = EnvParams(grid_size=9, n_drones=4)
        return DQN(DQNConfig(hidden_layers=(16, 16)), params)

    def test_q_values_t_matches_row_major(self):
        agent = self._agent()
        state = agent.init_state(jax.random.PRNGKey(0))
        obs = jax.random.uniform(jax.random.PRNGKey(1), (32, agent.obs_dim))
        q_row = agent.q_values(state.params, obs)
        q_t = agent.q_values_t(state.params, obs.T)
        np.testing.assert_allclose(
            np.asarray(q_row), np.asarray(q_t).T, rtol=1e-5, atol=1e-5)

    def test_act_t_greedy_matches_row_major(self):
        agent = self._agent()
        state = agent.init_state(jax.random.PRNGKey(0))
        obs = jax.random.uniform(jax.random.PRNGKey(2), (64, agent.obs_dim))
        a_row = agent.act(jax.random.PRNGKey(3), obs, state, greedy=True)
        a_t = agent.act_t(jax.random.PRNGKey(3), obs.T, state, greedy=True)
        assert (np.asarray(a_row) == np.asarray(a_t)).all()

    def test_train_step_t_matches_row_major(self):
        agent = self._agent()
        state = agent.init_state(jax.random.PRNGKey(0))
        rng = jax.random.PRNGKey(4)
        batch = {
            "obs": jax.random.uniform(rng, (8, agent.obs_dim)),
            "actions": jnp.arange(8, dtype=jnp.int32) % 5,
            "rewards": jnp.linspace(-1, 1, 8),
            "next_obs": jax.random.uniform(
                jax.random.PRNGKey(5), (8, agent.obs_dim)),
            "dones": jnp.array([0, 1, 0, 0, 1, 0, 0, 0], jnp.float32),
        }
        batch_t = dict(batch, obs=batch["obs"].T, next_obs=batch["next_obs"].T)
        s_row, loss_row = agent.train_step(state, batch)
        s_t, loss_t = agent.train_step_t(state, batch_t)
        np.testing.assert_allclose(
            float(loss_row), float(loss_t), rtol=1e-5)
        for (pa, pb) in zip(
            jax.tree.leaves(s_row.params), jax.tree.leaves(s_t.params)
        ):
            np.testing.assert_allclose(
                np.asarray(pa), np.asarray(pb), rtol=1e-4, atol=1e-6)


class TestFeatureMajorReplay:
    def test_push_sample_roundtrip(self):
        buf = replay.FeatureMajorReplay(capacity=32, batch_size=4)
        template = {"obs": jnp.zeros((6,), jnp.float32),
                    "r": jnp.array(0.0, jnp.float32)}
        state = buf.init(template)
        assert state.storage["obs"].shape == (6, 32)
        assert state.storage["r"].shape == (32,)
        batch = {"obs": jnp.arange(48, dtype=jnp.float32).reshape(6, 8),
                 "r": jnp.arange(8, dtype=jnp.float32)}
        state = buf.push_many(state, batch)
        assert int(state.size) == 8 and int(state.cursor) == 8
        assert not bool(buf.can_sample(replay.ReplayState(
            state.storage, state.cursor, jnp.array(3))))
        sample = buf.sample(jax.random.PRNGKey(0), state)
        assert sample["obs"].shape == (6, 4)
        # every sampled column must be one of the pushed columns
        pushed = np.asarray(batch["obs"]).T.tolist()
        for col in np.asarray(sample["obs"]).T.tolist():
            assert col in pushed

    def test_wrapping_write(self):
        buf = replay.FeatureMajorReplay(capacity=8, batch_size=2)
        state = buf.init({"x": jnp.array(0.0, jnp.float32)})
        state = buf.push_many(state, {"x": jnp.arange(6, dtype=jnp.float32)})
        state = buf.push_many(
            state, {"x": jnp.arange(6, dtype=jnp.float32) + 10})
        assert int(state.cursor) == 4
        assert int(state.size) == 8
        got = np.asarray(state.storage["x"])
        expected = np.array([12.0, 13.0, 14.0, 15.0, 4.0, 5.0, 10.0, 11.0])
        np.testing.assert_array_equal(got, expected)


class TestStreamReplay:
    def test_next_obs_is_successor_slot(self):
        stride, cap = 4, 16
        buf = replay.StreamReplay(capacity=cap, batch_size=8, stride=stride)
        state = buf.init({"obs": jnp.zeros((2,), jnp.float32),
                          "actions": jnp.array(0, jnp.int32)})
        # push steps 0..5 (wraps after step 3); obs encodes (step, env)
        for t in range(6):
            obs = jnp.stack([
                jnp.full((stride,), t, jnp.float32),
                jnp.arange(stride, dtype=jnp.float32)])
            state = buf.push_many(
                state, {"obs": obs,
                        "actions": jnp.full((stride,), t, jnp.int32)})
        assert bool(buf.can_sample(state))
        batch = buf.sample(jax.random.PRNGKey(0), state)
        steps = np.asarray(batch["obs"][0])
        envs = np.asarray(batch["obs"][1])
        next_steps = np.asarray(batch["next_obs"][0])
        next_envs = np.asarray(batch["next_obs"][1])
        # successor = same env, one step later; newest step never sampled
        np.testing.assert_array_equal(next_steps, steps + 1)
        np.testing.assert_array_equal(next_envs, envs)
        assert (steps >= 2).all() and (steps <= 4).all()  # stored: 2..5

    def test_not_full_excludes_newest(self):
        stride = 4
        buf = replay.StreamReplay(capacity=32, batch_size=16, stride=stride)
        state = buf.init({"obs": jnp.zeros((1,), jnp.float32)})
        for t in range(3):
            state = buf.push_many(
                state, {"obs": jnp.full((1, stride), t, jnp.float32)})
        batch = buf.sample(jax.random.PRNGKey(1), state)
        steps = np.asarray(batch["obs"][0])
        assert (steps <= 1).all()
        np.testing.assert_array_equal(
            np.asarray(batch["next_obs"][0]), steps + 1)


def test_fused_trainer_tick_smoke_interpret():
    from dronerl_tpu.train import build_train_step_fused

    env_params = EnvParams(grid_size=9, n_drones=4)
    num_envs = 128
    agent = DQN(DQNConfig(hidden_layers=(16, 16), epsilon_decay_every=5,
                          target_update_interval=5), env_params)
    buf = replay.StreamReplay(
        capacity=num_envs * 4, batch_size=8, stride=num_envs)
    template = {
        "obs": jnp.zeros((agent.obs_dim,), jnp.float32),
        "actions": jnp.array(0, jnp.int32),
        "rewards": jnp.array(0.0, jnp.float32),
        "dones": jnp.array(False, jnp.bool_),
    }
    rng = jax.random.PRNGKey(0)
    states = env_core.reset_batch(rng, env_params, num_envs)
    tstate = fused_tick.to_tstate(states)
    obs_t = env_core.observe_batch(states, env_params, 1).reshape(
        num_envs, agent.obs_dim).T
    carry = (rng, tstate, obs_t, agent.init_state(rng), buf.init(template),
             jnp.array(0))
    tick = build_train_step_fused(
        agent, buf, env_params, num_envs, 1, 100, interpret=True)
    for _ in range(3):
        carry, (rewards, eps, _loss) = tick(carry, None)
    assert rewards.shape == (num_envs,)
    assert np.isfinite(np.asarray(rewards)).all()
    assert float(eps) < 1.0  # ε decayed at least once


@pytest.mark.slow
def test_full_tick_fused_matches_jnp_mirror():
    """The all-in-one kernel (actor + step + obs + periodic reset) against
    a jnp mirror of its documented RNG contract."""
    from dronerl_tpu.constants import NUM_ACTIONS

    params = EnvParams(grid_size=9, n_drones=4)
    E = 128
    agent = DQN(DQNConfig(hidden_layers=(16, 16)), params)
    rng = jax.random.PRNGKey(0)
    ag = agent.init_state(rng)
    states = env_core.reset_batch(rng, params, E)
    tstate = fused_tick.to_tstate(states)
    obs_t = env_core.observe_batch(states, params, 1).reshape(
        E, agent.obs_dim).T
    eps = jnp.float32(0.7)

    for t in range(8):
        rng, skey = jax.random.split(rng)
        do_reset = jnp.array(t == 4)  # exercise the in-kernel reset once
        tstate2, rew_t, dn_t, actions_t, obs_next = (
            fused_tick.full_tick_fused(
                skey, tstate, obs_t, ag.params, eps, do_reset, params, 1,
                interpret=True))

        S = jax.random.split(skey, E + 2)
        u_act = jax.random.uniform(S[E], (params.n_drones + 1, E))
        rand = jnp.clip(
            jnp.floor(u_act[1:] * NUM_ACTIONS).astype(jnp.int32),
            0, NUM_ACTIONS - 1)
        greedy = jnp.argmax(
            agent.q_values_t(ag.params, obs_t), axis=0).astype(jnp.int32)
        a0 = jnp.where(u_act[0] < eps, rand[0], greedy)
        exp_actions = jnp.concatenate([a0[None], rand[1:]], axis=0)
        assert (np.asarray(actions_t) == np.asarray(exp_actions)).all(), t

        st_ref, rew_ref, dn_ref = env_core.step_batch(
            S[:E], states, np.asarray(exp_actions).T, params)
        assert (np.asarray(rew_ref) == np.asarray(rew_t).T).all(), t
        assert (np.asarray(dn_ref) == np.asarray(dn_t).T).all(), t

        exp_state = (
            env_core.reset_batch(S[E + 1], params, E)
            if bool(do_reset) else st_ref)
        back = fused_tick.from_tstate(tstate2, params)
        for f in ("ground", "air_x", "air_y", "carrying_package", "charge"):
            assert (np.asarray(getattr(exp_state, f))
                    == np.asarray(getattr(back, f))).all(), (t, f)

        exp_obs = np.asarray(env_core.observe_batch(
            exp_state, params, 1).reshape(E, -1)).reshape(E, -1, 6)
        ours = np.asarray(obs_next).T.reshape(E, -1, 6)
        ch = np.arange(6) != 4
        assert (exp_obs[..., ch] == ours[..., ch]).all(), t
        np.testing.assert_allclose(
            exp_obs[..., 4], ours[..., 4], atol=1.3e-7, rtol=0)

        states, tstate, obs_t = exp_state, tstate2, obs_next


@pytest.mark.slow
def test_ring_trainer_interpret():
    """Ring engine under the interpreter: aliased ring writes preserve
    unwritten blocks, bookkeeping stays in range, training tick runs."""
    from dronerl_tpu.train import build_train_step_ring, init_ring_carry

    params = EnvParams(grid_size=9, n_drones=4)
    E = 128
    cap = 4 * E
    agent = DQN(DQNConfig(hidden_layers=(16, 16), epsilon_decay_every=5,
                          target_update_interval=5), params)
    rng = jax.random.PRNGKey(0)
    tick = build_train_step_ring(
        agent, params, E, cap, batch_size=8, reset_env_every=100,
        interpret=True)
    carry = init_ring_carry(agent, params, E, cap, rng, batch_size=8)
    obs0 = np.asarray(carry[1][1][:, :E])
    for t in range(3):
        carry, (rew, eps, _loss) = tick(carry, None)
        assert np.isfinite(np.asarray(rew)).all(), t
    # after 3 ticks the ring holds obs_0..obs_3 in blocks 0..3; block 0
    # must still be the seeded initial observation (alias preserved)
    assert (np.asarray(carry[1][1][:, :E]) == obs0).all()
    assert int(carry[-1]) == 3
    assert float(eps) < 1.0
    # learner params moved (training began on the warm ring)
    p0 = jax.tree.leaves(
        agent.init_state(rng).params)[0]
    p1 = jax.tree.leaves(carry[-3].params)[0]
    assert not (np.asarray(p0) == np.asarray(p1)).all()


def test_fused_trainer_conv_actor_interpret():
    """Conv networks ride the fused env kernel with the conv actor in XLA
    (layout fallbacks in q_values_t / train_step_t)."""
    from dronerl_tpu.train import build_train_step_fused

    env_params = EnvParams(grid_size=9, n_drones=4)
    num_envs = 128
    agent = DQN(DQNConfig(network_type="conv", conv_dense_layers=(16,),
                          epsilon_decay_every=5, target_update_interval=5),
                env_params)
    buf = replay.StreamReplay(
        capacity=num_envs * 4, batch_size=8, stride=num_envs)
    template = {
        "obs": jnp.zeros((agent.obs_dim,), jnp.float32),
        "actions": jnp.array(0, jnp.int32),
        "rewards": jnp.array(0.0, jnp.float32),
        "dones": jnp.array(False, jnp.bool_),
    }
    rng = jax.random.PRNGKey(0)
    states = env_core.reset_batch(rng, env_params, num_envs)
    tstate = fused_tick.to_tstate(states)
    obs_t = env_core.observe_batch(states, env_params, 1).reshape(
        num_envs, agent.obs_dim).T
    carry = (rng, tstate, obs_t, agent.init_state(rng), buf.init(template),
             jnp.array(0))
    tick = build_train_step_fused(
        agent, buf, env_params, num_envs, 1, 100, interpret=True)
    for _ in range(3):
        carry, (rewards, eps, _loss) = tick(carry, None)
    assert np.isfinite(np.asarray(rewards)).all()


@pytest.mark.slow
def test_fast_rng_mode():
    """Opt-in reduced-round RNG (rng_rounds=8): deterministic, diverges
    from the bit-parity stream, and every env invariant still holds."""
    from dronerl_tpu.constants import Object

    params = EnvParams(grid_size=9, n_drones=4)
    E = 128
    agent = DQN(DQNConfig(hidden_layers=(16, 16)), params)
    rng = jax.random.PRNGKey(0)
    ag = agent.init_state(rng)
    states = env_core.reset_batch(rng, params, E)
    tstate = fused_tick.to_tstate(states)
    obs_t = env_core.observe_batch(states, params, 1).reshape(
        E, agent.obs_dim).T
    eps = jnp.float32(0.7)
    rng, skey = jax.random.split(rng)

    def run(rounds, do_reset=False):
        return fused_tick.full_tick_fused(
            skey, tstate, obs_t, ag.params, eps, jnp.array(do_reset),
            params, 1, interpret=True, rng_rounds=rounds)

    fast = run(8)
    fast_again = run(8)
    parity = run(20)
    for a, b in zip(jax.tree.leaves(fast), jax.tree.leaves(fast_again)):
        assert (np.asarray(a) == np.asarray(b)).all()
    diverged = any(
        np.asarray(a).shape == np.asarray(b).shape
        and (np.asarray(a) != np.asarray(b)).any()
        for a, b in zip(jax.tree.leaves(fast), jax.tree.leaves(parity)))
    assert diverged

    for out in (fast, run(8, do_reset=True)):
        st = fused_tick.from_tstate(out[0], params)
        g = params.grid_size
        ground = np.asarray(st.ground)
        codes = {0, Object.SKYSCRAPER.value, Object.STATION.value,
                 Object.DROPZONE.value, Object.PACKET.value}
        assert set(np.unique(ground)).issubset(codes)
        assert (np.asarray(st.air_x) >= 0).all()
        assert (np.asarray(st.air_x) < g).all()
        assert (np.asarray(st.air_y) >= 0).all()
        assert (np.asarray(st.air_y) < g).all()
        charge = np.asarray(st.charge)
        assert (charge >= 0).all() and (charge <= 100).all()
        obs = np.asarray(out[4])
        assert (obs >= 0).all() and (obs <= 1).all()
        assert np.isfinite(np.asarray(out[1])).all()


@pytest.mark.slow
def test_ring_trainer_bf16_interpret():
    """bf16 ring storage: transitions stay bit-exact (the ring only holds
    observations), sampled obs come back as f32 within bf16 rounding of
    the exact encodings, and a training tick runs end to end."""
    from dronerl_tpu.train import build_train_step_ring, init_ring_carry

    env_params = EnvParams(grid_size=9, n_drones=4)
    num_envs = 128
    agent = DQN(DQNConfig(hidden_layers=(16, 16), epsilon_decay_every=5,
                          target_update_interval=5), env_params)
    capacity = 4 * num_envs
    rng = jax.random.PRNGKey(0)
    tick = build_train_step_ring(
        agent, env_params, num_envs, capacity, batch_size=8,
        reset_env_every=100, interpret=True)
    c32 = init_ring_carry(agent, env_params, num_envs, capacity, rng,
                          batch_size=8)
    c16 = init_ring_carry(agent, env_params, num_envs, capacity, rng,
                          batch_size=8,
                          obs_dtype=jnp.bfloat16)
    assert c16[1][1].dtype == jnp.bfloat16
    for _ in range(3):
        c32, (r32, e32, _l) = tick(c32, None)
        c16, (r16, e16, _l) = tick(c16, None)
    # Env transitions identical: physics never reads ring contents beyond
    # the actor's Q forward, and for the first ticks both rings hold
    # bf16-exact 0/1 channel values (greedy actions agree).
    np.testing.assert_array_equal(np.asarray(r32), np.asarray(r16))
    ring32 = np.asarray(c32[1][1], np.float32)
    ring16 = np.asarray(c16[1][1], np.float32)
    np.testing.assert_allclose(ring32, ring16, atol=4e-3)  # bf16 rounding
    assert np.isfinite(ring16).all()


def test_fused_trainer_global_wrapper_interpret():
    """Full trainer tick with wrapper='global': the in-kernel actor
    consumes the full-grid observation and training advances."""
    from dronerl_tpu.train import build_train_step_full

    env_params = EnvParams(grid_size=9, n_drones=4, wrapper="global")
    num_envs = 128
    agent = DQN(DQNConfig(hidden_layers=(16, 16), epsilon_decay_every=5,
                          target_update_interval=5), env_params)
    assert agent.obs_dim == 9 * 9 * 6
    buf = replay.StreamReplay(
        capacity=num_envs * 4, batch_size=8, stride=num_envs)
    template = {
        "obs": jnp.zeros((agent.obs_dim,), jnp.float32),
        "actions": jnp.array(0, jnp.int32),
        "rewards": jnp.array(0.0, jnp.float32),
        "dones": jnp.array(False, jnp.bool_),
    }
    rng = jax.random.PRNGKey(0)
    states = env_core.reset_batch(rng, env_params, num_envs)
    tstate = fused_tick.to_tstate(states)
    obs_t = env_core.observe_batch(states, env_params, 1).reshape(
        num_envs, agent.obs_dim).T
    carry = (rng, tstate, obs_t, agent.init_state(rng), buf.init(template),
             jnp.array(0))
    tick = build_train_step_full(
        agent, buf, env_params, num_envs, 1, 100, interpret=True)
    for _ in range(3):
        carry, (rewards, eps, _loss) = tick(carry, None)
    assert np.isfinite(np.asarray(rewards)).all()
    assert float(eps) < 1.0


def test_ring_trainer_global_interpret():
    """Ring engine with wrapper='global': the in-kernel full-grid encoder
    writes 486-dim observation rows into the aliased ring and the actor
    consumes them — verified against the env core's global observation."""
    from dronerl_tpu.train import build_train_step_ring, init_ring_carry

    params = EnvParams(grid_size=9, n_drones=4, wrapper="global")
    E = 128
    cap = 4 * E
    agent = DQN(DQNConfig(hidden_layers=(16, 16), epsilon_decay_every=5,
                          target_update_interval=5), params)
    assert agent.obs_dim == 9 * 9 * 6
    rng = jax.random.PRNGKey(0)
    tick = build_train_step_ring(
        agent, params, E, cap, batch_size=8, reset_env_every=100,
        interpret=True)
    carry = init_ring_carry(agent, params, E, cap, rng, batch_size=8)
    assert carry[1][1].shape == (agent.obs_dim, cap)
    for t in range(3):
        carry, (rew, eps, _loss) = tick(carry, None)
        assert np.isfinite(np.asarray(rew)).all(), t
    # Ring block for tick 3 must hold the true full-grid view of the
    # post-tick env state.
    _, (tstate, ring) = carry[0], carry[1]
    state = fused_tick.from_tstate(tstate, params)
    expect = np.asarray(
        env_core.observe_batch(state, params, 1).reshape(
            E, agent.obs_dim).T)
    got = np.asarray(ring[:, 3 * E:4 * E], dtype=np.float32)
    np.testing.assert_allclose(got, expect, atol=1.4e-7)
    # learner trained on global observations
    p0 = jax.tree.leaves(agent.init_state(rng).params)[0]
    p1 = jax.tree.leaves(carry[-3].params)[0]
    assert not (np.asarray(p0) == np.asarray(p1)).all()
    assert float(eps) < 1.0


@pytest.mark.slow
def test_ring_trainer_resume_bitwise_interpret(tmp_path):
    """Full-state save/resume is engine-agnostic (train_state_io is a
    template-based pytree restore); this locks it for the RING carry
    specifically: tick(6) ≡ tick(3) → save → restore → tick(3), every
    carry leaf bitwise identical (incl. the aliased obs ring and the
    scalar rings). The CPU-side resume lock (tests/test_train.py::
    test_resume_bitwise_equivalence) only exercises the jnp engine."""
    import os

    from dronerl_tpu.interop import train_state_io
    from dronerl_tpu.train import build_train_step_ring, init_ring_carry

    params = EnvParams(grid_size=9, n_drones=4)
    E = 128
    cap = 4 * E
    agent = DQN(DQNConfig(hidden_layers=(16, 16), epsilon_decay_every=5,
                          target_update_interval=5), params)
    rng = jax.random.PRNGKey(0)
    tick = build_train_step_ring(
        agent, params, E, cap, batch_size=8, reset_env_every=100,
        interpret=True)

    def run(carry, n):
        for _ in range(n):
            carry, _out = tick(carry, None)
        return carry

    full = run(init_ring_carry(agent, params, E, cap, rng, batch_size=8), 6)

    half = run(init_ring_carry(agent, params, E, cap, rng, batch_size=8), 3)
    path = os.path.join(str(tmp_path), "ring_state.msgpack")
    train_state_io.save(path, half)
    template = init_ring_carry(agent, params, E, cap, rng, batch_size=8)
    resumed = run(train_state_io.restore(path, template), 3)

    leaves_a, treedef_a = jax.tree.flatten(full)
    leaves_b, treedef_b = jax.tree.flatten(resumed)
    assert treedef_a == treedef_b
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_ring_trainer_multicollect_interpret():
    """Ring engine widened to collect_drones > 1 (round 3): per-drone
    obs row groups in each ring column, (k, cap) scalar rings, per-drone
    row-group sampling — verified against the env core's observations.
    """
    from dronerl_tpu.train import build_train_step_ring, init_ring_carry

    params = EnvParams(grid_size=9, n_drones=4)
    E, k = 128, 2
    cap = 4 * E  # ring columns; 2 transitions per column
    agent = DQN(DQNConfig(hidden_layers=(16, 16), epsilon_decay_every=5,
                          target_update_interval=5), params)
    rng = jax.random.PRNGKey(0)
    tick = build_train_step_ring(
        agent, params, E, cap, batch_size=8, reset_env_every=100,
        interpret=True, collect_drones=k)
    carry = init_ring_carry(agent, params, E, cap, rng, collect_drones=k,
                            batch_size=8)
    D = agent.obs_dim
    assert carry[1][1].shape == (k * D, cap)
    assert carry[2][0].shape == (k, cap)

    for t in range(3):
        carry, (rew, eps, _loss) = tick(carry, None)
        assert np.isfinite(np.asarray(rew)).all(), t
    # The ring column block for tick t+1 must hold BOTH drones' true
    # observations of the post-tick env state (stacked row groups).
    _, (tstate, ring) = carry[0], carry[1]
    state = fused_tick.from_tstate(tstate, params)
    expect = np.asarray(
        env_core.observe_batch(state, params, k).reshape(E, k * D).T)
    got = np.asarray(ring[:, 3 * E:4 * E], dtype=np.float32)
    np.testing.assert_allclose(got, expect, atol=1.4e-7)
    # scalar rings populated for both drones on visited slots
    actions = np.asarray(carry[2][0][:, :3 * E])
    assert actions.shape == (k, 3 * E)
    assert (actions >= 0).all() and (actions < 5).all()
    # learner trained (batch gathered across both row groups)
    p0 = jax.tree.leaves(agent.init_state(rng).params)[0]
    p1 = jax.tree.leaves(carry[-3].params)[0]
    assert not (np.asarray(p0) == np.asarray(p1)).all()
    assert int(carry[-1]) == 3


def test_ring_multicollect_batch_divisibility():
    from dronerl_tpu.train import build_train_step_ring

    params = EnvParams(grid_size=9, n_drones=4)
    agent = DQN(DQNConfig(hidden_layers=(8,), epsilon_decay_every=5), params)
    with pytest.raises(ValueError, match="multiple of collect_drones"):
        build_train_step_ring(agent, params, 128, 512, batch_size=9,
                              reset_env_every=100, collect_drones=2)


# --- conv actor via im2col lowering (ops/conv2mat.py) -----------------------


def _conv_matmul_agents(env_params, conv_dense_layers=(), conv_layers=None):
    kw = {}
    if conv_layers is not None:
        kw["conv_layers"] = conv_layers
    flax_agent = DQN(DQNConfig(
        network_type="conv", conv_dense_layers=conv_dense_layers,
        epsilon_decay_every=5, target_update_interval=5, **kw), env_params)
    mm_agent = DQN(DQNConfig(
        network_type="conv", conv_dense_layers=conv_dense_layers,
        conv_matmul=True,
        epsilon_decay_every=5, target_update_interval=5, **kw), env_params)
    return flax_agent, mm_agent


@pytest.mark.parametrize(
    "conv_dense_layers,conv_layers",
    [
        ((), None),  # CLI default: one 8ch 3x3 conv + Dense(A)
        ((16,), None),
        # stacked convs incl. stride-2 / no-padding (exercises the
        # index map's downsampling branch)
        ((), (
            (("kernel_size", 3), ("out_channels", 8), ("padding", 1),
             ("stride", 1)),
            (("kernel_size", 3), ("out_channels", 4), ("padding", 0),
             ("stride", 2)),
        )),
    ])
def test_conv_matmul_forward_matches_flax(conv_dense_layers, conv_layers):
    """The im2col weight-chain forward (conv_matmul=True) computes the
    same function as the flax conv module — identical params pytree, Q
    values equal up to summation order."""
    env_params = EnvParams(grid_size=9, n_drones=4)
    flax_agent, mm_agent = _conv_matmul_agents(
        env_params, conv_dense_layers, conv_layers)
    st = flax_agent.init_state(jax.random.PRNGKey(0))
    obs = jax.random.uniform(jax.random.PRNGKey(1),
                             (32, flax_agent.obs_dim))
    qa = np.asarray(flax_agent.q_values(st.params, obs))
    qb = np.asarray(mm_agent.q_values(st.params, obs))
    qbt = np.asarray(mm_agent.q_values_t(st.params, obs.T).T)
    np.testing.assert_allclose(qa, qb, rtol=2e-5, atol=2e-6)
    # row-major and feature-major matmul paths agree tightly
    np.testing.assert_allclose(qb, qbt, rtol=2e-5, atol=2e-6)


@pytest.mark.slow
def test_full_tick_fused_conv_actor_matches_jnp_mirror():
    """The in-kernel CONV actor (net_spec lowering) against the jnp
    mirror of the documented RNG contract — the conv analogue of
    test_full_tick_fused_matches_jnp_mirror."""
    from dronerl_tpu.constants import NUM_ACTIONS

    params = EnvParams(grid_size=9, n_drones=4)
    E = 128
    _, agent = _conv_matmul_agents(params, conv_dense_layers=(16,))
    assert agent.net_spec is not None
    rng = jax.random.PRNGKey(0)
    ag = agent.init_state(rng)
    states = env_core.reset_batch(rng, params, E)
    tstate = fused_tick.to_tstate(states)
    obs_t = env_core.observe_batch(states, params, 1).reshape(
        E, agent.obs_dim).T
    eps = jnp.float32(0.7)

    for t in range(4):
        rng, skey = jax.random.split(rng)
        tstate2, rew_t, dn_t, actions_t, obs_next = (
            fused_tick.full_tick_fused(
                skey, tstate, obs_t, ag.params, eps, jnp.array(False),
                params, 1, interpret=True, net_spec=agent.net_spec))

        S = jax.random.split(skey, E + 2)
        u_act = jax.random.uniform(S[E], (params.n_drones + 1, E))
        rand = jnp.clip(
            jnp.floor(u_act[1:] * NUM_ACTIONS).astype(jnp.int32),
            0, NUM_ACTIONS - 1)
        greedy = jnp.argmax(
            agent.q_values_t(ag.params, obs_t), axis=0).astype(jnp.int32)
        a0 = jnp.where(u_act[0] < eps, rand[0], greedy)
        exp_actions = jnp.concatenate([a0[None], rand[1:]], axis=0)
        assert (np.asarray(actions_t) == np.asarray(exp_actions)).all(), t

        st_ref, rew_ref, dn_ref = env_core.step_batch(
            S[:E], states, np.asarray(exp_actions).T, params)
        assert (np.asarray(rew_ref) == np.asarray(rew_t).T).all(), t
        assert (np.asarray(dn_ref) == np.asarray(dn_t).T).all(), t

        states = st_ref
        tstate = tstate2
        obs_t = obs_next


@pytest.mark.slow
def test_ring_trainer_conv_actor_interpret():
    """Ring engine with a conv actor (conv_matmul lowering): aliased ring
    preserved, training runs, ε decays — the conv analogue of
    test_ring_trainer_interpret."""
    from dronerl_tpu.train import build_train_step_ring, init_ring_carry

    params = EnvParams(grid_size=9, n_drones=4)
    E = 128
    cap = 4 * E
    _, agent = _conv_matmul_agents(params, conv_dense_layers=(16,))
    rng = jax.random.PRNGKey(0)
    tick = build_train_step_ring(
        agent, params, E, cap, batch_size=8, reset_env_every=100,
        interpret=True)
    carry = init_ring_carry(agent, params, E, cap, rng, batch_size=8)
    obs0 = np.asarray(carry[1][1][:, :E])
    for t in range(3):
        carry, (rew, eps, _loss) = tick(carry, None)
        assert np.isfinite(np.asarray(rew)).all(), t
    assert (np.asarray(carry[1][1][:, :E]) == obs0).all()
    assert int(carry[-1]) == 3
    assert float(eps) < 1.0
    p0 = jax.tree.leaves(agent.init_state(rng).params)[0]
    p1 = jax.tree.leaves(carry[-3].params)[0]
    assert not (np.asarray(p0) == np.asarray(p1)).all()


def test_ring_conv_requires_conv_matmul():
    from dronerl_tpu.train import build_train_step_ring

    params = EnvParams(grid_size=9, n_drones=4)
    flax_agent, _ = _conv_matmul_agents(params)
    with pytest.raises(ValueError, match="conv_matmul"):
        build_train_step_ring(flax_agent, params, 128, 512, batch_size=8,
                              reset_env_every=100)


def test_conv_matmul_vmem_budget_guard():
    """An oversized im2col lowering must fail readably at trace time, not
    inside Mosaic: a wide conv stack on a big board blows the in-kernel
    weight budget."""
    env_params = EnvParams(grid_size=24, n_drones=4, wrapper="global")
    agent = DQN(DQNConfig(
        network_type="conv", conv_matmul=True,
        conv_layers=(
            {"kernel_size": 3, "out_channels": 64, "padding": 1,
             "stride": 1},
            {"kernel_size": 3, "out_channels": 64, "padding": 1,
             "stride": 1},
        ),
        conv_dense_layers=(64,), epsilon_decay_every=5), env_params)
    st = agent.init_state(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="VMEM|budget"):
        fused_tick._flatten_net_params(st.params, agent.net_spec)


def test_full_tick_hybrid_rng_env_parity():
    """Hybrid RNG (VERDICT-r3 item 6): with actor_rng_rounds=8 the
    actor/opponent uniform field runs an 8-round threefry (trainer-level
    noise, non-contractual) while EVERY env stream — per-env step keys,
    spawn uniforms, the reset chain — stays 20-round bit-exact. The env
    transition under the kernel's chosen actions must equal the jnp
    pipeline's exactly, and the actions themselves must match an
    8-round emulation of the documented actor contract
    (uniform(split(step_key, E+2)[E], (N+1, E)))."""
    from dronerl_tpu.constants import NUM_ACTIONS
    from dronerl_tpu.ops.fused_tick import _bits_to_unit_float
    from dronerl_tpu.ops.step_kernel import threefry2x32

    params = EnvParams(grid_size=9, n_drones=4)
    E = 128
    n = params.n_drones
    agent = DQN(DQNConfig(hidden_layers=(16, 16)), params)
    rng = jax.random.PRNGKey(3)
    ag = agent.init_state(rng)
    states = env_core.reset_batch(rng, params, E)
    tstate = fused_tick.to_tstate(states)
    obs_t = env_core.observe_batch(states, params, 1).reshape(
        E, agent.obs_dim).T
    eps = jnp.float32(0.7)

    for t in range(4):
        rng, skey = jax.random.split(rng)
        tstate2, rew_t, dn_t, actions_t, obs_next = (
            fused_tick.full_tick_fused(
                skey, tstate, obs_t, ag.params, eps, jnp.array(False),
                params, 1, interpret=True, actor_rng_rounds=8))

        # Actor key is still the contractual split(skey, E+2)[E]
        # (derived at 20 rounds); only the uniform FIELD is 8-round.
        S = jax.random.split(skey, E + 2)
        akey = jax.random.key_data(S[E]).astype(jnp.uint32)
        rows = jax.lax.broadcasted_iota(jnp.int32, (n + 1, E), 0)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (n + 1, E), 1)
        counts = (rows * E + lanes).astype(jnp.uint32)
        ab1, ab2 = threefry2x32(
            jnp.full((n + 1, E), akey[0], jnp.uint32),
            jnp.full((n + 1, E), akey[1], jnp.uint32),
            jnp.zeros_like(counts), counts, 8)
        u_act = _bits_to_unit_float(ab1 ^ ab2)
        rand = jnp.clip(
            jnp.floor(u_act[1:] * NUM_ACTIONS).astype(jnp.int32),
            0, NUM_ACTIONS - 1)
        greedy = jnp.argmax(
            agent.q_values_t(ag.params, obs_t), axis=0).astype(jnp.int32)
        a0 = jnp.where(u_act[0] < eps, rand[0], greedy)
        exp_actions = jnp.concatenate([a0[None], rand[1:]], axis=0)
        assert (np.asarray(actions_t) == np.asarray(exp_actions)).all(), t

        # Env transition under those actions: bit-exact vs jnp pipeline
        # (the parity-contractual part is untouched by the hybrid).
        st_ref, rew_ref, dn_ref = env_core.step_batch(
            S[:E], states, np.asarray(exp_actions).T, params)
        assert (np.asarray(rew_ref) == np.asarray(rew_t).T).all(), t
        assert (np.asarray(dn_ref) == np.asarray(dn_t).T).all(), t
        back = fused_tick.from_tstate(tstate2, params)
        for f in ("ground", "air_x", "air_y", "carrying_package", "charge"):
            assert (np.asarray(getattr(st_ref, f))
                    == np.asarray(getattr(back, f))).all(), (t, f)

        states, tstate, obs_t = st_ref, tstate2, obs_next


def test_full_tick_actor_rounds_none_is_default_contract():
    """actor_rng_rounds=None (the default) must stay bit-identical to
    the 20-round contract — the hybrid is strictly opt-in at the kernel
    level."""
    params = EnvParams(grid_size=9, n_drones=4)
    E = 128
    agent = DQN(DQNConfig(hidden_layers=(16, 16)), params)
    rng = jax.random.PRNGKey(5)
    ag = agent.init_state(rng)
    states = env_core.reset_batch(rng, params, E)
    tstate = fused_tick.to_tstate(states)
    obs_t = env_core.observe_batch(states, params, 1).reshape(
        E, agent.obs_dim).T
    skey = jax.random.PRNGKey(11)
    a = fused_tick.full_tick_fused(
        skey, tstate, obs_t, ag.params, jnp.float32(0.5), jnp.array(False),
        params, 1, interpret=True)
    b = fused_tick.full_tick_fused(
        skey, tstate, obs_t, ag.params, jnp.float32(0.5), jnp.array(False),
        params, 1, interpret=True, actor_rng_rounds=20)
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_in_kernel_td_matches_xla_learner():
    """The round-5 in-kernel TD+Adam (grid-step-0 learner) must track
    the XLA learner (DQN.train_step_t + optax.adam) on the identical
    batch stream. The production tick pipelines the batch one step
    through the carry (gathered after tick t with the sample-after
    window, trained inside tick t+1's kernel — see
    build_train_step_ring), so the reference here is a manual loop with
    the same pipeline: act/step via the no-TD kernel with theta_t, THEN
    train theta via train_step_t on the carried batch, matching the
    kernel's own ordering (the kernel actor reads the input params).
    Env side must be bitwise; learner floats agree to ULP-level (the
    bias-correction power is exp/log in-kernel vs optax's pow), far
    inside the Tier-B numerics band."""
    from dronerl_tpu.train import build_train_step_ring, init_ring_carry

    params = EnvParams(grid_size=9, n_drones=4)
    E, cap, bs = 128, 4 * 128, 8
    nb = cap // E
    agent = DQN(DQNConfig(hidden_layers=(16, 16), epsilon_decay_every=5,
                          target_update_interval=5), params)
    rng0 = jax.random.PRNGKey(3)
    tick_td = build_train_step_ring(
        agent, params, E, cap, bs, reset_env_every=50, interpret=True,
        in_kernel_td=True)
    c_td = init_ring_carry(agent, params, E, cap, rng0,
                           obs_dtype=jnp.bfloat16, batch_size=bs,
                           in_kernel_td=True)

    ref = init_ring_carry(agent, params, E, cap, rng0,
                          obs_dtype=jnp.bfloat16)  # aux=() reference
    rng, (tstate, ring), (a_ring, r_ring, d_ring), ag_state, _, _s = ref
    batch_prev = jax.tree.map(jnp.zeros_like, c_td[4])
    obs_dim = agent.obs_dim

    for t in range(6):
        c_td, (rew_t, eps_t, loss_t) = tick_td(c_td, None)

        # --- reference tick (same pipeline, XLA learner) -------------
        rng, step_key, sample_key = jax.random.split(rng, 3)
        read_slot = (t % nb) * E
        write_slot = ((t + 1) % nb) * E
        # env/actor side first, with theta_t (the kernel actor reads the
        # INPUT params; the in-kernel learner writes separate outputs)
        tstate, rewards_r, dones_r, actions_r, ring = (
            fused_tick.full_tick_fused_ring(
                step_key, tstate, ring, read_slot, write_slot,
                ag_state.params, ag_state.epsilon,
                jnp.array(t % 50 == 0), params, 1, True))
        can_train = min(t, nb - 1) * E >= bs
        if can_train:
            ag_state, loss_ref = agent.train_step_t(ag_state, batch_prev)
        else:
            loss_ref = jnp.float32(-1.0)
        a_ring, r_ring, d_ring = fused_tick.ring_scalar_writes(
            a_ring, r_ring, d_ring, actions_r, rewards_r, dones_r,
            read_slot, 1)
        valid = min(t + 1, nb - 1) * E
        batch_prev = fused_tick.ring_gather_batch(
            sample_key, ring, a_ring, r_ring, d_ring, jnp.int32(valid),
            jnp.int32(max(0, t + 2 - nb)), num_envs=E, capacity=cap,
            batch_size=bs, collect=1, obs_dim=obs_dim)
        ag_state = agent.apply_schedules(
            ag_state, jnp.int32(t), dones_r[0, 0])

        # --- compare ---------------------------------------------------
        np.testing.assert_array_equal(
            np.asarray(c_td[1][0].ground), np.asarray(tstate.ground))
        np.testing.assert_array_equal(
            np.asarray(c_td[1][1]), np.asarray(ring))
        np.testing.assert_array_equal(
            np.asarray(rew_t), np.asarray(rewards_r[0]))
        np.testing.assert_allclose(
            float(loss_t), float(loss_ref), rtol=1e-6, atol=1e-7)
        at, ar = c_td[3], ag_state
        assert int(at.opt_state[0].count) == int(ar.opt_state[0].count), t
        for lt_, lr_ in zip(jax.tree.leaves(at.params),
                            jax.tree.leaves(ar.params)):
            np.testing.assert_allclose(
                np.asarray(lt_), np.asarray(lr_), rtol=1e-5, atol=1e-6)
        for tree_t, tree_r in ((at.opt_state[0].mu, ar.opt_state[0].mu),
                               (at.opt_state[0].nu, ar.opt_state[0].nu)):
            for lt_, lr_ in zip(jax.tree.leaves(tree_t),
                                jax.tree.leaves(tree_r)):
                np.testing.assert_allclose(
                    np.asarray(lt_), np.asarray(lr_), rtol=1e-5, atol=1e-6)
    # both must actually have trained by now
    assert int(c_td[3].opt_state[0].count) > 0
    assert float(loss_t) != -1.0


def test_in_kernel_td_guards():
    """in_kernel_td=True must fail fast on unsupported configs (the
    in-kernel learner is dense-only; conv/XLA-actor configs keep the
    XLA learner), and the auto default must stay consistent between
    build_train_step_ring and init_ring_carry."""
    from dronerl_tpu.train import build_train_step_ring, init_ring_carry

    params = EnvParams(grid_size=9, n_drones=4)
    conv_agent = DQN(DQNConfig(network_type="conv", conv_dense_layers=(8,),
                               conv_matmul=True), params)
    with pytest.raises(ValueError, match="in_kernel_td"):
        build_train_step_ring(conv_agent, params, 128, 4 * 128, 8,
                              reset_env_every=50, in_kernel_td=True)
    # default (in_kernel_td off): aux stays () even with batch_size
    carry = init_ring_carry(conv_agent, params, 128, 4 * 128,
                            jax.random.PRNGKey(0), batch_size=8)
    assert carry[4] == ()
    # explicit opt-in seeds the pipelined-batch aux slot
    dense_agent = DQN(DQNConfig(hidden_layers=(16, 16)), params)
    carry = init_ring_carry(dense_agent, params, 128, 4 * 128,
                            jax.random.PRNGKey(0), batch_size=8,
                            in_kernel_td=True)
    assert set(carry[4]) == {"obs", "next_obs", "actions", "rewards",
                             "dones"}
    assert carry[4]["obs"].shape == (dense_agent.obs_dim, 8)
    # opting in without batch_size must fail fast
    with pytest.raises(ValueError, match="batch_size"):
        init_ring_carry(dense_agent, params, 128, 4 * 128,
                        jax.random.PRNGKey(0), in_kernel_td=True)
