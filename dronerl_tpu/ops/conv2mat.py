"""Convolution layers as im2col weight matrices (conv-actor ring engine).

The ring engine runs the ε-greedy actor inside the fused Pallas kernel
as a chain of ``(out, B) = Wᵀ(in,out) · x(in, B) + b`` matmuls
(``fused_tick._q_forward``). A 2-D convolution is a linear map, so a
conv layer lowers to exactly that shape: a static scatter places each
weight element ``W[dy, dx, ci, co]`` (flax HWIO layout,
reference conv contract: /root/reference/jax_impl/agents/dqn.py:66-94)
into an ``(in_dim, out_dim)`` matrix ``M`` with

    in_row  = (yi · W_in + xi) · C_in + ci          (NHWC flatten)
    out_row = (yo · W_out + xo) · C_out + co        (NHWC flatten)
              or co · H_out·W_out + yo · W_out + xo (NCHW — final layer,
              matching ConvQNet's torch-compatible transpose-then-flatten)
    yi = yo·stride + dy − padding,  xi = xo·stride + dx − padding

``M`` is rebuilt from the live weights every tick (one cheap scatter of
|W| elements in XLA, outside the kernel) and fed through the kernel's
existing dense weight path — the kernel itself needs no conv code. The
same matrices drive the XLA-side forward (``DQN.q_values*`` with
``conv_matmul=True``) so the in-kernel actor and the learner/eval paths
share one contraction structure (the bit-parity recipe the dense actor
already uses).

Cost: the matmul is ``in_dim × out_dim`` dense (~5× the conv's real
MACs at 7×7×6 → 7×7×8: 115k vs 21k), but it is ONE MXU-friendly
dot per layer — ~75 µs/tick at 65,536 envs vs ~430 scalar-shift VPU ops
for a direct in-kernel conv.
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "net_layer_specs", "effective_dense_params", "conv_out_hw",
]


def conv_out_hw(h: int, w: int, k: int, stride: int,
                padding: int) -> Tuple[int, int]:
    return ((h + 2 * padding - k) // stride + 1,
            (w + 2 * padding - k) // stride + 1)


def net_layer_specs(config, obs_shape) -> Tuple:
    """Static per-layer descriptor tuple for a conv network.

    Entries: ``("conv", H_in, W_in, C_in, C_out, k, stride, padding,
    nchw_out)`` or ``("dense",)``. Hashable — safe as a jit static arg.
    Returns ``None`` for dense networks (the all-dense fast path).
    """
    if config.network_type != "conv":
        return None
    h, w, c = obs_shape
    specs = []
    conv_specs = config.conv_specs()
    for i, spec in enumerate(conv_specs):
        k = spec["kernel_size"]
        s = spec.get("stride", 1)
        p = spec.get("padding", 0)
        co = spec["out_channels"]
        final = i == len(conv_specs) - 1
        specs.append(("conv", h, w, c, co, k, s, p, final))
        h, w = conv_out_hw(h, w, k, s, p)
        c = co
    for _ in tuple(config.conv_dense_layers) + (1,):
        specs.append(("dense",))
    return tuple(specs)


@functools.lru_cache(maxsize=64)
def _conv_indices(h: int, w: int, ci: int, co: int, k: int, stride: int,
                  padding: int, nchw_out: bool):
    """Static scatter indices: weight flat-idx → (in_row, out_row)."""
    h_out, w_out = conv_out_hw(h, w, k, stride, padding)
    in_rows, out_rows, w_idx = [], [], []
    for yo in range(h_out):
        for xo in range(w_out):
            for dy in range(k):
                yi = yo * stride + dy - padding
                if not 0 <= yi < h:
                    continue
                for dx in range(k):
                    xi = xo * stride + dx - padding
                    if not 0 <= xi < w:
                        continue
                    for c_in in range(ci):
                        in_row = (yi * w + xi) * ci + c_in
                        for c_out in range(co):
                            if nchw_out:
                                out_row = (c_out * h_out * w_out
                                           + yo * w_out + xo)
                            else:
                                out_row = (yo * w_out + xo) * co + c_out
                            in_rows.append(in_row)
                            out_rows.append(out_row)
                            w_idx.append(
                                ((dy * k + dx) * ci + c_in) * co + c_out)
    return (np.asarray(in_rows, np.int32), np.asarray(out_rows, np.int32),
            np.asarray(w_idx, np.int32), h_out, w_out)


def _conv_layer_matrix(kernel: jax.Array, bias: jax.Array, spec):
    """(HWIO kernel, (Co,) bias) → (M (in_dim,out_dim), bias (out_dim,1))."""
    _, h, w, ci, co, k, stride, padding, nchw = spec
    in_rows, out_rows, w_idx, h_out, w_out = _conv_indices(
        h, w, ci, co, k, stride, padding, nchw)
    m = jnp.zeros((h * w * ci, h_out * w_out * co), jnp.float32)
    m = m.at[in_rows, out_rows].set(
        kernel.astype(jnp.float32).reshape(-1)[w_idx], unique_indices=True)
    if nchw:
        b = jnp.repeat(bias.astype(jnp.float32), h_out * w_out)
    else:
        b = jnp.tile(bias.astype(jnp.float32), h_out * w_out)
    return m, b[:, None]


def effective_dense_params(net_params, net_spec):
    """flax conv-net params → [(W (in,out), b (out,1)), ...] matmul chain.

    Consumed by ``fused_tick._q_forward`` (in-kernel actor) and by
    ``DQN.q_values*`` when ``conv_matmul=True`` — one shared lowering so
    both paths produce identical contractions.
    """
    layers = net_params["params"]
    out, conv_i, dense_i = [], 0, 0
    for spec in net_spec:
        if spec[0] == "conv":
            layer = layers[f"Conv_{conv_i}"]
            out.append(_conv_layer_matrix(layer["kernel"], layer["bias"],
                                          spec))
            conv_i += 1
        else:
            layer = layers[f"Dense_{dense_i}"]
            out.append((layer["kernel"].astype(jnp.float32),
                        layer["bias"].astype(jnp.float32)[:, None]))
            dense_i += 1
    return out


