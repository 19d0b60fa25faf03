"""Fused DQN learner: TD backward + Adam + schedules in one Pallas dispatch.

The TD update on a replay batch is tiny math (dense MLP forward x2,
hand-derived backward, Adam on ~5k parameters) spread across ~40 XLA
kernels — pure dispatch overhead on the target TPU. This kernel folds the
whole learner tick into one dispatch:

* Q forward on the (obs_dim, B) batch with saved activations,
* target-network forward for the bootstrap,
* analytic MSE/TD backward through the dense stack,
* Adam (optax `scale_by_adam` formulas: bias-corrected first/second
  moments, ``update = -lr * mu_hat / (sqrt(nu_hat) + eps)``),
* predicated extras: hard/EMA target sync (``tau``), multiplicative
  ε decay with a floor — all under `pl.when` flags, with every state
  array aliased in/out so a skipped update writes nothing.

Numerics match `DQN.train_step_t` + `update_target` + `decay_epsilon`
within float tolerance (the bias-correction powers use exp/log instead
of iterated multiplies); asserted in tests/test_learner_kernel.py.

Status: NOT wired into the production trainer. Measured end-to-end at
32768 envs it is ~340µs/step SLOWER than the cond-based XLA learner —
threading ~26 aliased state arrays through a pallas_call inside the scan
carry costs more than the dispatches it removes. Kept as a verified
building block (and a data point: fusion pays for the env tick's many
medium ops, not for a handful of tiny ones behind an alias boundary).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dronerl_tpu.agents.dqn import DQNConfig, DQNState
from dronerl_tpu.constants import NUM_ACTIONS

_ADAM_B1 = 0.9
_ADAM_B2 = 0.999
_ADAM_EPS = 1e-8


def _learner_kernel(sp_ref, x_ref, xn_ref, a_ref, r_ref, d_ref, count_ref,
                    eps_ref, *rest, n_layers: int, batch: int,
                    config: DQNConfig):
    params_in = [(rest[2 * i], rest[2 * i + 1]) for i in range(n_layers)]
    off = 2 * n_layers
    target_in = [(rest[off + 2 * i], rest[off + 2 * i + 1])
                 for i in range(n_layers)]
    off2 = 4 * n_layers
    mu_in = [(rest[off2 + 2 * i], rest[off2 + 2 * i + 1])
             for i in range(n_layers)]
    off3 = 6 * n_layers
    nu_in = [(rest[off3 + 2 * i], rest[off3 + 2 * i + 1])
             for i in range(n_layers)]
    outs = rest[8 * n_layers :]
    params_out = [(outs[2 * i], outs[2 * i + 1]) for i in range(n_layers)]
    target_out = [(outs[off + 2 * i], outs[off + 2 * i + 1])
                  for i in range(n_layers)]
    mu_out = [(outs[off2 + 2 * i], outs[off2 + 2 * i + 1])
              for i in range(n_layers)]
    nu_out = [(outs[off3 + 2 * i], outs[off3 + 2 * i + 1])
              for i in range(n_layers)]
    count_out = outs[8 * n_layers]
    eps_out = outs[8 * n_layers + 1]

    learn = sp_ref[0] != 0
    sync_target = sp_ref[1] != 0
    decay_eps = sp_ref[2] != 0

    def forward(x, weights):
        acts = [x]
        h = x
        for idx, (w_ref, b_ref) in enumerate(weights):
            h = jax.lax.dot_general(
                w_ref[:], h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + b_ref[:]
            if idx < n_layers - 1:
                h = jnp.maximum(h, 0.0)
            acts.append(h)
        return acts

    acts = forward(x_ref[:], params_in)          # [x, h1, ..., q]
    q = acts[-1]                                  # (A, B)
    next_q = forward(xn_ref[:], target_in)[-1]

    arow = jax.lax.broadcasted_iota(jnp.int32, (NUM_ACTIONS, 1), 0)
    onehot_a = (arow == a_ref[:]).astype(jnp.float32)        # (A, B)
    taken = jnp.sum(q * onehot_a, axis=0, keepdims=True)      # (1, B)
    bootstrap = jnp.max(next_q, axis=0, keepdims=True)
    target = r_ref[:] + config.gamma * bootstrap * (1.0 - d_ref[:])
    delta = taken - target

    # d(mean(delta^2))/dq = onehot * 2*delta/B
    gout = onehot_a * (delta * (2.0 / batch))                  # (A, B)
    grads = [None] * n_layers
    for idx in range(n_layers - 1, -1, -1):
        a_prev = acts[idx]                                     # (in, B)
        dw = jax.lax.dot_general(
            a_prev, gout, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                # (in, out)
        db = jnp.sum(gout, axis=1, keepdims=True)              # (out, 1)
        grads[idx] = (dw, db)
        if idx > 0:
            gin = jax.lax.dot_general(
                params_in[idx][0][:], gout, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # (in, B)
            gout = gin * (a_prev > 0)

    new_count = count_ref[:] + 1              # (1, 1)
    cf = new_count.astype(jnp.float32)
    bc1 = 1.0 - jnp.exp(cf * jnp.log(jnp.float32(_ADAM_B1)))
    bc2 = 1.0 - jnp.exp(cf * jnp.log(jnp.float32(_ADAM_B2)))

    new_params = []
    for idx in range(n_layers):
        pair = []
        for j, g in enumerate(grads[idx]):
            p = params_in[idx][j][:]
            m = _ADAM_B1 * mu_in[idx][j][:] + (1 - _ADAM_B1) * g
            v = _ADAM_B2 * nu_in[idx][j][:] + (1 - _ADAM_B2) * g * g
            update = (m / bc1) / (jnp.sqrt(v / bc2) + _ADAM_EPS)
            pair.append((p - config.learning_rate * update, m, v))
        new_params.append(pair)

    @pl.when(learn)
    def _():
        for idx in range(n_layers):
            for j in range(2):
                p, m, v = new_params[idx][j]
                params_out[idx][j][:] = p
                mu_out[idx][j][:] = m
                nu_out[idx][j][:] = v
        count_out[:] = new_count

    @pl.when(sync_target)
    def _():
        for idx in range(n_layers):
            for j in range(2):
                eff = jnp.where(
                    learn, new_params[idx][j][0], params_in[idx][j][:])
                old_t = target_in[idx][j][:]
                target_out[idx][j][:] = (
                    config.tau * eff + (1.0 - config.tau) * old_t)

    @pl.when(decay_eps)
    def _():
        eps_out[:] = jnp.maximum(
            eps_ref[:] * config.epsilon_decay, config.epsilon_end)


def _flatten(tree):
    layers = tree["params"]
    n_layers = len(layers)
    flat = []
    for idx in range(n_layers):
        layer = layers[f"Dense_{idx}"]
        flat.append(layer["kernel"])
        flat.append(layer["bias"][:, None])
    return flat, n_layers


def _unflatten(flat, template):
    layers = template["params"]
    out = {}
    for idx in range(len(layers)):
        out[f"Dense_{idx}"] = {
            "kernel": flat[2 * idx],
            "bias": flat[2 * idx + 1][:, 0],
        }
    return {"params": out}


@functools.partial(jax.jit, static_argnames=("config", "interpret"))
def learn_tick_fused(
    batch,
    ag_state: DQNState,
    learn_flag: jax.Array,
    target_flag: jax.Array,
    eps_flag: jax.Array,
    config: DQNConfig,
    interpret: bool = False,
) -> DQNState:
    """One fused learner tick; returns the updated DQNState.

    ``batch``: dict with obs/next_obs (obs_dim, B) and actions/rewards/
    dones (B,). Flags gate the TD update, the target sync and the ε
    decay. Every state tensor is aliased in/out — a gated-off update
    leaves its arrays untouched (and uncopied).
    """
    flat_p, n_layers = _flatten(ag_state.params)
    flat_t, _ = _flatten(ag_state.target_params)
    adam_state = ag_state.opt_state[0]
    flat_mu, _ = _flatten(adam_state.mu)
    flat_nu, _ = _flatten(adam_state.nu)
    bsz = batch["actions"].shape[0]

    kernel = functools.partial(
        _learner_kernel, n_layers=n_layers, batch=bsz, config=config)

    def vspec(arr):
        return pl.BlockSpec(
            arr.shape, lambda *_: tuple(0 for _ in arr.shape),
            memory_space=pltpu.VMEM)

    state_arrays = flat_p + flat_t + flat_mu + flat_nu
    count = adam_state.count.reshape(1, 1)
    eps = ag_state.epsilon.astype(jnp.float32).reshape(1, 1)
    x = batch["obs"].astype(jnp.float32)
    xn = batch["next_obs"].astype(jnp.float32)
    a = batch["actions"].astype(jnp.int32).reshape(1, bsz)
    r = batch["rewards"].astype(jnp.float32).reshape(1, bsz)
    d = batch["dones"].astype(jnp.float32).reshape(1, bsz)

    inputs = [x, xn, a, r, d, count, eps] + state_arrays
    out_shapes = tuple(
        jax.ShapeDtypeStruct(arr.shape, arr.dtype) for arr in state_arrays
    ) + (
        jax.ShapeDtypeStruct((1, 1), jnp.int32),
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )
    # alias every state input onto its output (sp is input 0)
    n_state = len(state_arrays)
    aliases = {8 + i: i for i in range(n_state)}
    aliases[6] = n_state       # count
    aliases[7] = n_state + 1   # epsilon
    sp = jnp.stack([
        learn_flag.astype(jnp.int32),
        target_flag.astype(jnp.int32),
        eps_flag.astype(jnp.int32),
    ])
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[vspec(arr) for arr in inputs],
            out_specs=tuple(vspec(arr) for arr in state_arrays)
            + (vspec(count), vspec(eps)),
        ),
        out_shape=out_shapes,
        input_output_aliases=aliases,
        interpret=interpret,
    )(sp, *inputs)
    L2 = 2 * n_layers
    new_p = _unflatten(outs[:L2], ag_state.params)
    new_t = _unflatten(outs[L2 : 2 * L2], ag_state.target_params)
    new_mu = _unflatten(outs[2 * L2 : 3 * L2], adam_state.mu)
    new_nu = _unflatten(outs[3 * L2 : 4 * L2], adam_state.nu)
    new_count = outs[4 * L2][0, 0]
    new_eps = outs[4 * L2 + 1][0, 0]
    new_adam = adam_state._replace(count=new_count, mu=new_mu, nu=new_nu)
    return ag_state.replace(
        params=new_p,
        target_params=new_t,
        opt_state=(new_adam,) + tuple(ag_state.opt_state[1:]),
        epsilon=new_eps,
    )
