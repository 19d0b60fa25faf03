"""DQN agent unit tests: shapes, learning signal, target sync, persistence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dronerl_tpu.agents.dqn import DQN, DQNConfig
from dronerl_tpu.env.types import EnvParams

ENV = EnvParams()
OBS_DIM = (2 * ENV.window_radius + 1) ** 2 * 6


@pytest.fixture(params=["dense", "conv"])
def agent(request):
    if request.param == "dense":
        cfg = DQNConfig(network_type="dense", hidden_layers=(16, 16))
    else:
        cfg = DQNConfig(
            network_type="conv",
            conv_layers=({"out_channels": 4, "kernel_size": 3,
                          "stride": 1, "padding": 1},),
            conv_dense_layers=(8,),
        )
    return DQN(cfg, ENV)


def test_act_shapes_and_range(agent):
    state = agent.init_state(jax.random.PRNGKey(0))
    obs = jax.random.uniform(jax.random.PRNGKey(1), (5, OBS_DIM))
    actions = agent.act(jax.random.PRNGKey(2), obs, state)
    assert actions.shape == (5,)
    acts = np.asarray(actions)
    assert ((acts >= 0) & (acts < 5)).all()


def test_greedy_act_is_argmax(agent):
    state = agent.init_state(jax.random.PRNGKey(0))
    obs = jax.random.uniform(jax.random.PRNGKey(1), (3, OBS_DIM))
    actions = agent.act(jax.random.PRNGKey(2), obs, state, greedy=True)
    expected = jnp.argmax(agent.q_values(state.params, obs), axis=-1)
    np.testing.assert_array_equal(np.asarray(actions), np.asarray(expected))


def test_epsilon_one_is_uniform_random(agent):
    # With epsilon=1 every action must be an explore action.
    state = agent.init_state(jax.random.PRNGKey(0))
    state = state.replace(epsilon=jnp.asarray(1.0))
    obs = jnp.zeros((512, OBS_DIM))
    actions = np.asarray(agent.act(jax.random.PRNGKey(3), obs, state))
    # all identical obs: a greedy policy would emit a single action id
    assert len(np.unique(actions)) == 5


def test_train_step_reduces_td_loss(agent):
    state = agent.init_state(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(4)
    batch = {
        "obs": jax.random.uniform(key, (32, OBS_DIM)),
        "actions": jax.random.randint(jax.random.fold_in(key, 1), (32,), 0, 5),
        "rewards": jax.random.uniform(jax.random.fold_in(key, 2), (32,)),
        "next_obs": jax.random.uniform(jax.random.fold_in(key, 3), (32, OBS_DIM)),
        "dones": jnp.zeros((32,), dtype=jnp.float32),
    }
    _, first_loss = agent.train_step(state, batch)
    for _ in range(50):
        state, loss = agent.train_step(state, batch)
    assert float(loss) < float(first_loss)


def test_update_target_hard_copy(agent):
    state = agent.init_state(jax.random.PRNGKey(0))
    # target starts different from online params
    diffs = jax.tree.map(
        lambda a, b: np.abs(np.asarray(a) - np.asarray(b)).sum(),
        state.params, state.target_params)
    assert sum(jax.tree.leaves(diffs)) > 0
    state = agent.update_target(state)
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(state.target_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_epsilon_decay_floor():
    cfg = DQNConfig(epsilon_start=1.0, epsilon_decay=0.5, epsilon_end=0.3)
    agent = DQN(cfg, ENV)
    state = agent.init_state(jax.random.PRNGKey(0))
    for _ in range(10):
        state = agent.decay_epsilon(state)
    assert float(state.epsilon) == pytest.approx(0.3)


def test_save_load_roundtrip_jax(agent, tmp_path):
    state = agent.init_state(jax.random.PRNGKey(0))
    path = str(tmp_path / "ckpt.safetensors")
    agent.save(path, state)
    restored_agent, params = DQN.restore(path, ENV)
    obs = jax.random.uniform(jax.random.PRNGKey(1), (4, OBS_DIM))
    np.testing.assert_allclose(
        np.asarray(agent.q_values(state.params, obs)),
        np.asarray(restored_agent.q_values(params, obs)),
        rtol=0, atol=0)


def test_save_torch_then_load_back(agent, tmp_path):
    """jax → torch-format → jax round trip preserves outputs exactly."""
    state = agent.init_state(jax.random.PRNGKey(0))
    path = str(tmp_path / "ckpt_torch.safetensors")
    agent.save_as_torch(path, state)
    restored_agent, params = DQN.restore(path, ENV)
    obs = jax.random.uniform(jax.random.PRNGKey(1), (4, OBS_DIM))
    np.testing.assert_allclose(
        np.asarray(agent.q_values(state.params, obs)),
        np.asarray(restored_agent.q_values(params, obs)),
        rtol=1e-6, atol=1e-6)


def test_format_guard(agent, tmp_path):
    from dronerl_tpu.interop import safetensors_io

    state = agent.init_state(jax.random.PRNGKey(0))
    jax_path = str(tmp_path / "a.safetensors")
    torch_path = str(tmp_path / "b.safetensors")
    agent.save(jax_path, state)
    agent.save_as_torch(torch_path, state)
    with pytest.raises(safetensors_io.CheckpointFormatError):
        safetensors_io.load_torch(jax_path)
    with pytest.raises(safetensors_io.CheckpointFormatError):
        safetensors_io.load_jax(torch_path)
