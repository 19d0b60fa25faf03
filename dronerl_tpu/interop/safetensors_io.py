"""Dual-format (jax / torch) safetensors weight checkpoints.

The on-disk contract is shared with the reference implementation so that
checkpoints interoperate in both directions (reference:
jax_impl/agents/dqn.py:282-357, torch_impl/agents/dqn.py:173-276):

* tensors: flattened parameter tree with ``.``-joined keys;
* string metadata: ``network_type``, ``dense_layers``, ``conv_layers``,
  ``conv_dense_layers``, ``obs_shape``, ``action_shape``,
  ``checkpoint_format`` ∈ {``jax``, ``torch``} and
  ``checkpoint_format_version``;
* torch format renames ``params.Dense_k.kernel`` →
  ``network.dense_{k+1}.weight`` (transposed) and ``params.Conv_k.kernel``
  → ``network.conv2d_{k+1}.weight`` (HWIO→OIHW), mirroring the torch
  module naming scheme.

Loading a jax checkpoint through the torch path (or vice versa) raises —
the format field is a hard guard, matching reference behavior.
"""

import ast
from typing import Any, Tuple

import jax
import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict
from safetensors import safe_open
from safetensors.numpy import load_file, save_file

from dronerl_tpu.constants import NUM_ACTIONS

FORMAT_VERSION = "0.1"


class CheckpointFormatError(Exception):
    """Raised when a checkpoint's format does not match the loader."""


def _metadata(config, env_params, fmt: str) -> dict:
    from dronerl_tpu.agents.dqn import DQNConfig  # noqa: F401 (type context)

    if fmt == "torch" and config.network_type == "conv":
        # torch impl reuses the dense_layers key for the conv head widths.
        dense_layers = str(tuple(config.conv_dense_layers))
    else:
        dense_layers = str(tuple(config.hidden_layers))
    return {
        "network_type": config.network_type,
        "dense_layers": dense_layers,
        "conv_layers": str(config.conv_specs()),
        "conv_dense_layers": str(tuple(config.conv_dense_layers)),
        # obs_shape follows the wrapper: (2r+1, 2r+1, C) for 'window',
        # (grid, grid, C) for 'global' — the torch loader dispatches the
        # rebuilt network's input shape on this field.
        "obs_shape": str(tuple(env_params.obs_shape)),
        "action_shape": str((NUM_ACTIONS,)),
        "checkpoint_format": fmt,
        "checkpoint_format_version": FORMAT_VERSION,
    }


def _to_host(params: Any) -> dict:
    # ascontiguousarray matters: device_get may hand back Fortran-ordered
    # arrays, and safetensors serializes the raw buffer without
    # normalizing memory order.
    params = jax.device_get(params)
    return {
        k: np.ascontiguousarray(np.asarray(v))
        for k, v in flatten_dict(params, sep=".").items()
    }


def save_jax(path: str, params: Any, config, env_params) -> None:
    """Write q-network params in the native jax naming scheme."""
    save_file(_to_host(params), path, metadata=_metadata(config, env_params, "jax"))


def save_torch(path: str, params: Any, config, env_params) -> None:
    """Write q-network params renamed/transposed for the torch loader."""
    flat = _to_host(params)
    renamed = {}
    for key, tensor in flat.items():
        parts = key.split(".")
        if parts[0] == "params":
            parts[0] = "network"
        layer = parts[1]
        if layer.startswith("Dense"):
            idx = int(layer.split("_")[1])
            parts[1] = f"dense_{idx + 1}"
        elif layer.startswith("Conv"):
            idx = int(layer.split("_")[1])
            parts[1] = f"conv2d_{idx + 1}"
        if parts[-1] == "kernel":
            parts[-1] = "weight"
            if parts[1].startswith("dense"):
                tensor = tensor.T
            elif parts[1].startswith("conv"):
                tensor = tensor.transpose(3, 2, 0, 1)  # HWIO → OIHW
            else:
                raise CheckpointFormatError(f"Unexpected parameter key {key!r}")
        renamed[".".join(parts)] = np.ascontiguousarray(tensor)
    save_file(renamed, path, metadata=_metadata(config, env_params, "torch"))


def _config_from_metadata(metadata: dict):
    from dronerl_tpu.agents.dqn import DQNConfig

    network_type = metadata.get("network_type", "dense")
    if network_type == "dense":
        return DQNConfig(
            network_type="dense",
            hidden_layers=tuple(ast.literal_eval(metadata["dense_layers"])),
        )
    if network_type == "conv":
        # Historical torch checkpoints (e.g. the reference's frozen
        # sample_models) carry the conv head widths in ``dense_layers``
        # and omit ``conv_dense_layers`` entirely — the reference conv
        # factory reads ``dense_layers`` (reference:
        # torch_impl/agents/dqn.py:263-276). Prefer the explicit key,
        # fall back to the historical one.
        head = metadata.get(
            "conv_dense_layers", metadata.get("dense_layers"))
        if head is None:
            raise CheckpointFormatError(
                "conv checkpoint metadata has neither 'conv_dense_layers' "
                "nor 'dense_layers' — malformed checkpoint (refusing to "
                "default to an empty dense head)")
        return DQNConfig(
            network_type="conv",
            conv_layers=ast.literal_eval(metadata["conv_layers"]),
            conv_dense_layers=tuple(ast.literal_eval(head)),
        )
    raise CheckpointFormatError(f"Unknown network type {network_type!r}")


def read_metadata(path: str) -> dict:
    with safe_open(path, "np") as f:
        return dict(f.metadata() or {})


def load_jax(path: str) -> Tuple[Any, Any]:
    """Load a jax-format checkpoint → (config, params pytree)."""
    metadata = read_metadata(path)
    if metadata.get("checkpoint_format") != "jax":
        raise CheckpointFormatError(
            f"{path} is not a jax-format checkpoint "
            f"(format={metadata.get('checkpoint_format')!r})")
    params = unflatten_dict(load_file(path), sep=".")
    return _config_from_metadata(metadata), params


def load_torch(path: str) -> Tuple[Any, Any]:
    """Load a torch-format checkpoint → (config, params pytree in jax naming)."""
    metadata = read_metadata(path)
    if metadata.get("checkpoint_format", "torch") != "torch":
        raise CheckpointFormatError(
            f"{path} is not a torch-format checkpoint "
            f"(format={metadata.get('checkpoint_format')!r})")
    flat = load_file(path)
    renamed = {}
    for key, tensor in flat.items():
        parts = key.split(".")
        if parts[0] == "network":
            parts[0] = "params"
        layer = parts[1]
        if layer.startswith("dense"):
            idx = int(layer.split("_")[1])
            parts[1] = f"Dense_{idx - 1}"
        elif layer.startswith("conv2d"):
            idx = int(layer.split("_")[1])
            parts[1] = f"Conv_{idx - 1}"
        if parts[-1] == "weight":
            parts[-1] = "kernel"
            if parts[1].startswith("Dense"):
                tensor = tensor.T
            elif parts[1].startswith("Conv"):
                tensor = tensor.transpose(2, 3, 1, 0)  # OIHW → HWIO
            else:
                raise CheckpointFormatError(f"Unexpected parameter key {key!r}")
        renamed[".".join(parts)] = tensor
    params = unflatten_dict(renamed, sep=".")
    return _config_from_metadata(metadata), params


def load_checkpoint(path: str) -> Tuple[Any, Any]:
    """Format-dispatching loader: accepts jax- or torch-format checkpoints."""
    metadata = read_metadata(path)
    fmt = metadata.get("checkpoint_format", "torch")
    if fmt == "jax":
        return load_jax(path)
    if fmt == "torch":
        return load_torch(path)
    raise CheckpointFormatError(f"Unknown checkpoint format {fmt!r}")
