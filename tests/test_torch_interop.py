"""Cross-framework checkpoint interop, verified against REAL torch.

Builds the torch-side module exactly as the reference torch factories do
(layer naming ``dense_{i}`` / ``conv2d_{i}``, NCHW convs, reference:
torch_impl/agents/dqn.py:44-159), loads our torch-format checkpoint into
it, and asserts numerically identical outputs — both directions.
"""

import ast
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import torch.nn as nn  # noqa: E402
from safetensors import safe_open  # noqa: E402

from dronerl_tpu.agents.dqn import DQN, DQNConfig  # noqa: E402
from dronerl_tpu.env.types import EnvParams  # noqa: E402

ENV = EnvParams()
OBS_SHAPE = (7, 7, 6)
OBS_DIM = 7 * 7 * 6


def build_torch_dense(metadata, state_dict):
    hidden = tuple(ast.literal_eval(metadata["dense_layers"]))
    dims = [OBS_DIM, *hidden, 5]
    net = nn.Sequential()
    for i in range(len(dims) - 1):
        if i > 0:
            net.add_module(f"dense_act_{i}", nn.ReLU())
        net.add_module(f"dense_{i + 1}", nn.Linear(dims[i], dims[i + 1]))
    net.load_state_dict(
        {k.removeprefix("network."): v for k, v in state_dict.items()})
    return net


def build_torch_conv(metadata, state_dict):
    conv_layers = ast.literal_eval(metadata["conv_layers"])
    dense_layers = tuple(ast.literal_eval(metadata["dense_layers"]))
    net = nn.Sequential()
    in_ch = OBS_SHAPE[-1]
    for i, spec in enumerate(conv_layers):
        spec = dict(spec)
        net.add_module(f"conv2d_{i + 1}", nn.Conv2d(in_ch, **spec))
        net.add_module(f"conv2d_act_{i + 1}", nn.ReLU())
        in_ch = spec["out_channels"]
    net.add_module("flatten", nn.Flatten())
    with torch.no_grad():
        flat = net(torch.zeros(1, OBS_SHAPE[2], OBS_SHAPE[0], OBS_SHAPE[1]))
    dims = [flat.shape[1], *dense_layers, 5]
    for i in range(len(dims) - 1):
        if i > 0:
            net.add_module(f"dense_act_{i}", nn.ReLU())
        net.add_module(f"dense_{i + 1}", nn.Linear(dims[i], dims[i + 1]))
    net.load_state_dict(
        {k.removeprefix("network."): v for k, v in state_dict.items()})
    return net


@pytest.mark.parametrize("network_type", ["dense", "conv"])
def test_jax_to_torch_outputs_match(network_type, tmp_path):
    if network_type == "dense":
        cfg = DQNConfig(network_type="dense", hidden_layers=(16, 8))
    else:
        cfg = DQNConfig(
            network_type="conv",
            conv_layers=({"out_channels": 4, "kernel_size": 3,
                          "stride": 1, "padding": 1},),
            conv_dense_layers=(8,))
    agent = DQN(cfg, ENV)
    state = agent.init_state(jax.random.PRNGKey(0))
    path = str(tmp_path / "ckpt.safetensors")
    agent.save_as_torch(path, state)

    with safe_open(path, framework="pt", device="cpu") as f:
        metadata = f.metadata()
        sd = {k: f.get_tensor(k) for k in f.keys()}
    assert metadata["checkpoint_format"] == "torch"

    x = np.random.RandomState(0).rand(4, OBS_DIM).astype(np.float32)
    jax_out = np.asarray(agent.q_values(state.params, x))
    if network_type == "dense":
        net = build_torch_dense(metadata, sd)
        with torch.no_grad():
            torch_out = net(torch.tensor(x)).numpy()
    else:
        net = build_torch_conv(metadata, sd)
        # torch convs take NCHW
        x_img = torch.tensor(x.reshape(4, *OBS_SHAPE)).permute(0, 3, 1, 2)
        with torch.no_grad():
            torch_out = net(x_img).numpy()
    np.testing.assert_allclose(jax_out, torch_out, rtol=1e-4, atol=1e-5)


SAMPLE_MODELS = "/root/reference/sample_models"


def _import_reference_torch_dqn():
    """Import the reference's REAL torch agent module.

    The reference imports ``gym`` at module level (reference:
    torch_impl/agents/dqn.py:5-6); a minimal stub under scripts/_stubs
    satisfies the import — the factories under test never touch it.
    """
    import sys

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for p in (os.path.join(repo_root, "scripts", "_stubs"), "/root/reference"):
        if p not in sys.path:
            sys.path.append(p)
    import importlib

    return importlib.import_module("torch_impl.agents.dqn")


needs_reference = pytest.mark.skipif(
    not os.path.isdir(SAMPLE_MODELS), reason="reference checkout not mounted")


@needs_reference
@pytest.mark.parametrize("idx", [1, 2, 3, 4, 5])
def test_reference_frozen_checkpoints_load(idx):
    """The reference's actual historical sample_models load through our
    loader, the parsed config matches the metadata, and our network's
    outputs agree with the reference torch factory's rebuilt network
    (reference: drone_evaluator.py:30-36 loads these same files)."""
    path = os.path.join(SAMPLE_MODELS, f"dqn-agent-{idx}.safetensors")
    with safe_open(path, framework="np") as f:
        metadata = dict(f.metadata() or {})
    # Historical files omit checkpoint_format / conv_dense_layers — the
    # loader must tolerate both.
    assert "checkpoint_format" not in metadata

    agent, params = DQN.restore(path, ENV)
    if metadata["network_type"] == "dense":
        assert agent.config.hidden_layers == tuple(
            ast.literal_eval(metadata["dense_layers"]))
    else:
        assert agent.config.conv_dense_layers == tuple(
            ast.literal_eval(metadata["dense_layers"]))

    x = np.random.RandomState(idx).rand(4, OBS_DIM).astype(np.float32)
    jax_out = np.asarray(agent.q_values(params, x))
    assert jax_out.shape == (4, 5)
    assert np.all(np.isfinite(jax_out))

    ref_dqn = _import_reference_torch_dqn()
    factory = ref_dqn.BaseDQNFactory.from_checkpoint(path)
    net, _opt = factory.create_qnetwork()
    with torch.no_grad():
        torch_out = net(x.reshape(4, *OBS_SHAPE)).cpu().numpy()
    np.testing.assert_allclose(jax_out, torch_out, rtol=1e-4, atol=1e-5)

    # Greedy action agreement on the same observations.
    assert np.array_equal(
        np.argmax(jax_out, axis=-1), np.argmax(torch_out, axis=-1))


@needs_reference
@pytest.mark.parametrize("network_type", ["dense", "conv"])
def test_our_torch_saves_load_in_reference_factory(network_type, tmp_path):
    """Round-trip: our torch-format save → the reference's actual
    ``BaseDQNFactory.from_checkpoint`` → identical outputs (reference:
    torch_impl/agents/dqn.py:173-183)."""
    if network_type == "dense":
        cfg = DQNConfig(network_type="dense", hidden_layers=(16, 8))
    else:
        cfg = DQNConfig(
            network_type="conv",
            conv_layers=({"out_channels": 4, "kernel_size": 3,
                          "stride": 1, "padding": 1},),
            conv_dense_layers=(8,))
    agent = DQN(cfg, ENV)
    state = agent.init_state(jax.random.PRNGKey(7))
    path = str(tmp_path / "ours_as_torch.safetensors")
    agent.save_as_torch(path, state)

    ref_dqn = _import_reference_torch_dqn()
    factory = ref_dqn.BaseDQNFactory.from_checkpoint(path)
    net, _opt = factory.create_qnetwork()
    x = np.random.RandomState(3).rand(4, OBS_DIM).astype(np.float32)
    with torch.no_grad():
        torch_out = net(x.reshape(4, *OBS_SHAPE)).cpu().numpy()
    jax_out = np.asarray(agent.q_values(state.params, x))
    np.testing.assert_allclose(jax_out, torch_out, rtol=1e-4, atol=1e-5)

    # And the jax-format twin is rejected by the reference loader —
    # the format guard the reference enforces (torch_impl/agents/dqn.py:174).
    jax_path = str(tmp_path / "ours_as_jax.safetensors")
    agent.save(jax_path, state)
    with pytest.raises(Exception, match="JAX checkpoint"):
        ref_dqn.BaseDQNFactory.from_checkpoint(jax_path)


def test_global_wrapper_checkpoint_metadata(tmp_path):
    """A 'global'-wrapper agent records the full-grid obs_shape, not the
    window shape — the torch loader rebuilds its input layer from this
    field (reference: torch_impl/agents/dqn.py:212-224)."""
    env = EnvParams(wrapper="global", grid_size=10)
    cfg = DQNConfig(network_type="dense", hidden_layers=(8,))
    agent = DQN(cfg, env)
    state = agent.init_state(jax.random.PRNGKey(0))
    for fmt, save in (("jax", agent.save), ("torch", agent.save_as_torch)):
        path = str(tmp_path / f"global_{fmt}.safetensors")
        save(path, state)
        with safe_open(path, framework="np") as f:
            metadata = dict(f.metadata())
        assert ast.literal_eval(metadata["obs_shape"]) == (10, 10, 6)
        # and that shape actually matches the network input
        assert 10 * 10 * 6 == agent.obs_dim


def test_torch_to_jax_roundtrip(tmp_path):
    """A checkpoint written by torch-side code loads into our agent."""
    from safetensors.torch import save_file

    torch.manual_seed(0)
    net = nn.Sequential()
    net.add_module("dense_1", nn.Linear(OBS_DIM, 12))
    net.add_module("dense_act_1", nn.ReLU())
    net.add_module("dense_2", nn.Linear(12, 5))
    metadata = {
        "network_type": "dense",
        "dense_layers": "(12,)",
        "conv_layers": "()",
        "conv_dense_layers": "()",
        "obs_shape": str(OBS_SHAPE),
        "action_shape": "(5,)",
        "checkpoint_format": "torch",
        "checkpoint_format_version": "0.1",
    }
    path = str(tmp_path / "torch_native.safetensors")
    save_file({f"network.{k}": v.contiguous()
               for k, v in net.state_dict().items()}, path,
              metadata=metadata)

    agent, params = DQN.restore(path, ENV)
    x = np.random.RandomState(1).rand(3, OBS_DIM).astype(np.float32)
    with torch.no_grad():
        torch_out = net(torch.tensor(x)).numpy()
    jax_out = np.asarray(agent.q_values(params, x))
    np.testing.assert_allclose(jax_out, torch_out, rtol=1e-4, atol=1e-5)


def test_conv_metadata_missing_head_rejected():
    """Conv metadata with neither conv_dense_layers nor dense_layers raises.

    Guards the ADVICE-r2 fix: the fallback used to silently default to an
    empty dense head instead of reporting a malformed checkpoint.
    """
    from dronerl_tpu.interop.safetensors_io import (
        CheckpointFormatError, _config_from_metadata)

    with pytest.raises(CheckpointFormatError, match="malformed"):
        _config_from_metadata({
            "network_type": "conv",
            "conv_layers": "((8, 3, 1, 1),)",
        })
