"""On-device DQN actor-learner.

TPU-first design notes:

* ``act`` is **batched-native**: one forward pass over the whole env batch
  (a single MXU matmul chain) with an elementwise ε-greedy select — no
  per-env ``lax.cond`` branches, which serialize and starve the MXU
  (the reference acts per-env, reference: jax_impl/agents/dqn.py:132-145).
* ``DQNState`` carries only arrays (params / target params / optimizer
  state / ε), so it flows through ``lax.scan``, ``shard_map`` and
  checkpointing without static-field plumbing. The network topology and
  optimizer are static attributes of :class:`DQN`, derived from
  :class:`DQNConfig`.
* Parameter trees use flax's canonical ``Dense_i`` / ``Conv_i`` naming and
  the conv trunk transposes NHWC→NCHW before flattening, preserving the
  safetensors interop contract with torch checkpoints (reference:
  jax_impl/agents/dqn.py:66-94,305-357).
"""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax.struct import dataclass

from dronerl_tpu.constants import NUM_ACTIONS, NUM_OBS_CHANNELS
from dronerl_tpu.env.types import EnvParams
from dronerl_tpu.ops import conv2mat


def _freeze_conv_specs(specs) -> Tuple[Tuple[Tuple[str, int], ...], ...]:
    """Normalize conv layer specs (dicts or item-tuples) to hashable tuples."""
    if isinstance(specs, dict):
        specs = (specs,)
    frozen = []
    for spec in specs:
        if isinstance(spec, dict):
            frozen.append(tuple(sorted(spec.items())))
        else:
            frozen.append(tuple(spec))
    return tuple(frozen)


@dataclass
class DQNConfig:
    """Static agent hyper-parameters (hashable; safe as a jit static arg).

    ``conv_layers`` accepts dicts like
    ``{"out_channels": 8, "kernel_size": 3, "stride": 1, "padding": 1}``
    and stores them as sorted item-tuples so the config stays hashable;
    use :meth:`conv_specs` to read them back as dicts.
    """

    hidden_layers: Tuple[int, ...] = (32, 32)
    network_type: str = "dense"  # 'dense' | 'conv'
    conv_layers: Tuple = (
        (("kernel_size", 3), ("out_channels", 8), ("padding", 1), ("stride", 1)),
    )
    conv_dense_layers: Tuple[int, ...] = ()
    gamma: float = 0.95
    epsilon_start: float = 1.0
    epsilon_decay: float = 0.999
    epsilon_end: float = 0.01
    epsilon_decay_every: Optional[int] = None
    learning_rate: float = 1e-3
    target_update_interval: int = 5
    tau: float = 1.0  # 1.0 = hard target copy; <1 = EMA
    # Compute conv layers as im2col weight matrices (ops/conv2mat.py)
    # instead of XLA conv primitives. Same parameters/checkpoints, same
    # math up to summation order; required for the in-kernel conv actor
    # (ring engine), where the Pallas kernel and the XLA-side learner
    # must share one contraction structure. Opt-in: flipping it changes
    # float summation order, so greedy trajectories of a trained net can
    # differ from the default conv path's.
    conv_matmul: bool = False

    def __post_init__(self):
        object.__setattr__(
            self, "conv_layers", _freeze_conv_specs(self.conv_layers))
        object.__setattr__(self, "hidden_layers", tuple(self.hidden_layers))
        object.__setattr__(
            self, "conv_dense_layers", tuple(self.conv_dense_layers))

    def conv_specs(self) -> Tuple[Dict[str, int], ...]:
        return tuple(dict(spec) for spec in self.conv_layers)


@dataclass
class DQNState:
    """Learner state: pure pytree of arrays."""

    params: Any
    target_params: Any
    opt_state: Any
    epsilon: jax.Array


class DenseQNet(nn.Module):
    """Flatten → (Dense+ReLU)* → Dense(num_actions)."""

    hidden_layers: Tuple[int, ...] = (32, 32)

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        for width in self.hidden_layers:
            x = nn.Dense(width, kernel_init=nn.initializers.he_normal())(x)
            x = nn.relu(x)
        return nn.Dense(NUM_ACTIONS)(x)


class ConvQNet(nn.Module):
    """(Conv+ReLU)* → NCHW flatten → (Dense+ReLU)* → Dense(num_actions).

    The NHWC→NCHW transpose before flattening makes the flattened feature
    order identical to the torch implementation so dense weights transfer
    checkpoint-exactly.
    """

    obs_shape: Tuple[int, ...]
    conv_layers: Tuple[Dict[str, int], ...] = (
        {"out_channels": 8, "kernel_size": 3, "stride": 1, "padding": 1},
    )
    dense_layers: Tuple[int, ...] = ()

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], *self.obs_shape)
        for spec in self.conv_layers:
            k = spec["kernel_size"]
            s = spec.get("stride", 1)
            x = nn.Conv(
                features=spec["out_channels"],
                kernel_size=(k, k),
                strides=(s, s),
                padding=spec.get("padding", 0),
            )(x)
            x = nn.relu(x)
        x = x.transpose(0, 3, 1, 2)  # torch-compatible flatten order
        x = x.reshape(x.shape[0], -1)
        for width in self.dense_layers:
            x = nn.Dense(width)(x)
            x = nn.relu(x)
        return nn.Dense(NUM_ACTIONS)(x)


def build_network(config: DQNConfig, env_params: EnvParams) -> nn.Module:
    if env_params.wrapper not in ("window", "global"):
        raise NotImplementedError(f"wrapper={env_params.wrapper!r}")
    if config.network_type == "dense":
        return DenseQNet(tuple(config.hidden_layers))
    if config.network_type == "conv":
        return ConvQNet(
            obs_shape=env_params.obs_shape,
            conv_layers=config.conv_specs(),
            dense_layers=tuple(config.conv_dense_layers),
        )
    raise ValueError(f"Unsupported network type {config.network_type!r}")


class DQN:
    """Functional DQN: static topology + pure state-transition methods."""

    def __init__(self, config: DQNConfig, env_params: EnvParams):
        self.config = config
        self.env_params = env_params
        self.network = build_network(config, env_params)
        self.optimizer = optax.adam(config.learning_rate)
        h, w, c = env_params.obs_shape
        self.obs_dim = h * w * c
        # Static per-layer descriptor for the im2col-matmul forward
        # (None unless this is a conv net with conv_matmul on). Passed to
        # the fused kernels as their net_spec static arg.
        self.net_spec = (
            conv2mat.net_layer_specs(config, env_params.obs_shape)
            if config.network_type == "conv" and config.conv_matmul
            else None)

    # --- lifecycle -----------------------------------------------------

    def init_state(self, rng: jax.Array) -> DQNState:
        dummy = jnp.zeros((1, self.obs_dim), dtype=jnp.float32)
        params = self.network.init({"params": rng}, dummy)
        rng, target_rng = jax.random.split(rng)
        target_params = self.network.init({"params": target_rng}, dummy)
        return DQNState(
            params=params,
            target_params=target_params,
            opt_state=self.optimizer.init(params),
            epsilon=jnp.asarray(self.config.epsilon_start, dtype=jnp.float32),
        )

    # --- acting ----------------------------------------------------------

    def q_values(self, params: Any, obs: jax.Array) -> jax.Array:
        """Forward pass. obs: (B, obs_dim) or (B, H, W, C) → (B, A)."""
        if self.net_spec is not None:
            # im2col-matmul conv forward: the same (in,out) weight chain
            # the in-kernel actor consumes (ops/conv2mat.py), applied
            # row-major exactly like flax Dense (x @ W + b).
            x = obs.reshape(obs.shape[0], -1)
            chain = conv2mat.effective_dense_params(params, self.net_spec)
            for idx, (w, b) in enumerate(chain):
                x = x @ w + b[:, 0]
                if idx < len(chain) - 1:
                    x = nn.relu(x)
            return x
        return self.network.apply(params, obs.reshape(obs.shape[0], -1))

    def act(
        self,
        key: jax.Array,
        obs: jax.Array,
        state: DQNState,
        greedy: bool = False,
    ) -> jax.Array:
        """ε-greedy actions for a whole batch in one fused forward pass."""
        batch = obs.shape[0]
        greedy_actions = jnp.argmax(self.q_values(state.params, obs), axis=-1)
        if greedy:
            return greedy_actions
        explore_key, action_key = jax.random.split(key)
        explore = jax.random.uniform(explore_key, (batch,)) < state.epsilon
        random_acts = jax.random.randint(
            action_key, (batch,), minval=0, maxval=NUM_ACTIONS)
        return jnp.where(explore, random_acts, greedy_actions)

    # --- feature-major (transposed) paths ---------------------------------
    #
    # The fused TPU training loop keeps every tensor feature-major
    # (features on sublanes, envs/batch on lanes — see ops/fused_tick.py).
    # These paths consume (obs_dim, B) observations directly with the SAME
    # parameter pytree (flax Dense kernels are (in, out); the forward is
    # kernelᵀ @ x), so checkpoints stay interchangeable with the row-major
    # path. Dense networks only.

    def q_values_t(self, params: Any, obs_t: jax.Array) -> jax.Array:
        """Forward pass on (obs_dim, B) observations → (num_actions, B).

        Dense networks run natively feature-major; conv networks with
        ``conv_matmul`` run the same im2col weight chain the in-kernel
        actor uses (ops/conv2mat.py); other conv networks fall back to
        the row-major module behind a pair of transposes (the fused env
        engine still applies — only the tiny Q forward changes layout).
        """
        if self.config.network_type != "dense" and self.net_spec is None:
            return self.q_values(params, obs_t.T).T
        if self.net_spec is not None:
            chain = conv2mat.effective_dense_params(params, self.net_spec)
            x = obs_t
            for idx, (w, b) in enumerate(chain):
                x = jnp.einsum(
                    "io,ib->ob", w, x, preferred_element_type=jnp.float32)
                x = x + b
                if idx < len(chain) - 1:
                    x = nn.relu(x)
            return x
        # Dense path: trace order kept byte-stable (bias reshape inline,
        # between einsums) — the benchmark program's jaxpr hash and the
        # shipped warm compilation cache key on it (tests/test_bench_program.py).
        layers = params["params"]
        x = obs_t
        n_layers = len(layers)
        for idx in range(n_layers):
            layer = layers[f"Dense_{idx}"]
            x = jnp.einsum(
                "io,ib->ob", layer["kernel"], x,
                preferred_element_type=jnp.float32)
            x = x + layer["bias"][:, None]
            if idx < n_layers - 1:
                x = nn.relu(x)
        return x

    def act_t(
        self,
        key: jax.Array,
        obs_t: jax.Array,
        state: DQNState,
        greedy: bool = False,
    ) -> jax.Array:
        """ε-greedy actions for (obs_dim, B) observations → (B,) int32."""
        batch = obs_t.shape[1]
        greedy_actions = jnp.argmax(
            self.q_values_t(state.params, obs_t), axis=0)
        if greedy:
            return greedy_actions
        explore_key, action_key = jax.random.split(key)
        explore = jax.random.uniform(explore_key, (batch,)) < state.epsilon
        random_acts = jax.random.randint(
            action_key, (batch,), minval=0, maxval=NUM_ACTIONS)
        return jnp.where(explore, random_acts, greedy_actions)

    def train_step_t(
        self,
        state: DQNState,
        batch: Dict[str, jax.Array],
        axis_name: Optional[str] = None,
    ) -> Tuple[DQNState, jax.Array]:
        """TD(0) update on a feature-major replay batch.

        ``batch``: obs/next_obs (obs_dim, B); actions/rewards/dones (B,).
        Same math as :meth:`train_step` on transposed operands. With
        ``axis_name`` (inside ``shard_map``) gradients and loss are
        pmean-reduced over the mesh axis before the (replicated) update.
        """

        def loss_fn(params):
            q = self.q_values_t(params, batch["obs"])
            taken = jnp.take_along_axis(
                q, batch["actions"][None, :], axis=0)[0]
            next_q = self.q_values_t(state.target_params, batch["next_obs"])
            bootstrap = jnp.max(next_q, axis=0)
            target = batch["rewards"] + self.config.gamma * bootstrap * (
                1 - batch["dones"]
            )
            return jnp.mean(jnp.square(taken - jax.lax.stop_gradient(target)))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        if axis_name is not None:
            # Same vma-aware branch as train_step_distributed: under
            # check_vma=True shard_maps autodiff already inserted the
            # gradient all-reduce (replicated params × varying batch),
            # so a further pmean would execute a second, redundant
            # collective round per step. Today's call sites all run
            # check_vma=False (explicit pmean IS the sync), but a
            # future typed caller must not reintroduce the doubled
            # all-reduce (tests/test_distributed.py collective guard).
            batch_vma = getattr(
                jax.typeof(batch["obs"]), "vma", frozenset())
            if axis_name in batch_vma:
                n = jax.lax.axis_size(axis_name)
                grads = jax.tree.map(lambda g: g / n, grads)
            else:
                grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(params=params, opt_state=opt_state), loss

    # --- learning --------------------------------------------------------

    def train_step(
        self, state: DQNState, batch: Dict[str, jax.Array]
    ) -> Tuple[DQNState, jax.Array]:
        """One TD(0) update on a replay batch; returns (state, loss)."""

        def loss_fn(params):
            q = self.q_values(params, batch["obs"])
            taken = jnp.take_along_axis(
                q, batch["actions"][:, None], axis=1
            ).squeeze(-1)
            next_q = self.q_values(state.target_params, batch["next_obs"])
            bootstrap = jnp.max(next_q, axis=1)
            target = batch["rewards"] + self.config.gamma * bootstrap * (
                1 - batch["dones"]
            )
            return jnp.mean(jnp.square(taken - jax.lax.stop_gradient(target)))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(params=params, opt_state=opt_state), loss

    def train_step_distributed(
        self, state: DQNState, batch: Dict[str, jax.Array], axis_name: str
    ) -> Tuple[DQNState, jax.Array]:
        """Data-parallel update: grads are psum-averaged over ``axis_name``.

        For use inside ``shard_map``: every shard computes gradients on its
        local replay sample, the mean gradient rides the ICI all-reduce, and
        all shards apply an identical Adam update (params stay replicated).
        """

        def loss_fn(params):
            q = self.q_values(params, batch["obs"])
            taken = jnp.take_along_axis(
                q, batch["actions"][:, None], axis=1
            ).squeeze(-1)
            next_q = self.q_values(state.target_params, batch["next_obs"])
            bootstrap = jnp.max(next_q, axis=1)
            target = batch["rewards"] + self.config.gamma * bootstrap * (
                1 - batch["dones"]
            )
            return jnp.mean(jnp.square(taken - jax.lax.stop_gradient(target)))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        # Under shard_map's vma typing (check_vma=True), differentiating
        # REPLICATED params against VARYING batch data already inserts
        # the gradient all-reduce (a psum per leaf, inside the flax
        # backward): grads arrive invariant, holding the SUM of
        # per-shard means. A further pmean would be numerically a no-op
        # (×axis_size then ÷axis_size) but XLA still executes it as a
        # second, redundant collective round per step — measured as a
        # doubled all-reduce set in the lowered chunk
        # (tests/test_distributed.py::test_chunk_collective_pattern).
        # With typing off (check_vma=False), autodiff inserts nothing
        # and the explicit pmean IS the gradient all-reduce.
        batch_vma = getattr(jax.typeof(batch["obs"]), "vma", frozenset())
        if axis_name in batch_vma:
            n = jax.lax.axis_size(axis_name)
            grads = jax.tree.map(lambda g: g / n, grads)
        else:
            grads = jax.lax.pmean(grads, axis_name)
        loss = jax.lax.pmean(loss, axis_name)
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(params=params, opt_state=opt_state), loss

    def update_target(self, state: DQNState) -> DQNState:
        """Hard copy (tau=1) or EMA of online params into the target net."""
        target = optax.incremental_update(
            state.params, state.target_params, self.config.tau)
        return state.replace(target_params=target)

    def decay_epsilon(self, state: DQNState) -> DQNState:
        eps = jnp.maximum(
            state.epsilon * self.config.epsilon_decay, self.config.epsilon_end)
        return state.replace(epsilon=eps)

    def should_decay_epsilon(self, step: jax.Array, done: jax.Array) -> jax.Array:
        """Decay every N steps if configured, else at episode boundaries."""
        if self.config.epsilon_decay_every is None:
            return done
        return step % self.config.epsilon_decay_every == 0

    def apply_schedules(self, state: DQNState, step: jax.Array,
                        done: jax.Array) -> DQNState:
        """Target-EMA + ε-decay as predicated selects, no ``lax.cond``.

        Bit-identical to conditionally calling :meth:`update_target` /
        :meth:`decay_epsilon` (a select returns exactly one branch's
        value), but both branches are a handful of elementwise ops on
        tiny tensors, so computing them unconditionally removes two XLA
        conditionals — sequencing points the scan body otherwise pays
        every step (round-5 tail optimization, PERF.md)."""
        do_t = step % self.config.target_update_interval == 0
        ema = optax.incremental_update(
            state.params, state.target_params, self.config.tau)
        target = jax.tree.map(
            lambda new, old: jnp.where(do_t, new, old),
            ema, state.target_params)
        do_e = self.should_decay_epsilon(step, done)
        eps = jnp.where(
            do_e,
            jnp.maximum(state.epsilon * self.config.epsilon_decay,
                        self.config.epsilon_end),
            state.epsilon)
        return state.replace(target_params=target, epsilon=eps)

    # --- persistence -------------------------------------------------------

    def save(self, path: str, state: DQNState) -> None:
        from dronerl_tpu.interop import safetensors_io

        safetensors_io.save_jax(path, state.params, self.config, self.env_params)

    def save_as_torch(self, path: str, state: DQNState) -> None:
        from dronerl_tpu.interop import safetensors_io

        safetensors_io.save_torch(path, state.params, self.config, self.env_params)

    @staticmethod
    def restore(path: str, env_params: EnvParams) -> Tuple["DQN", Any]:
        """Load any checkpoint (jax- or torch-format) → (agent, params)."""
        from dronerl_tpu.interop import safetensors_io

        config, params = safetensors_io.load_checkpoint(path)
        agent = DQN(config, env_params)
        return agent, params

    def state_with_params(self, state: DQNState, params: Any) -> DQNState:
        """Install loaded params into both online and target networks."""
        return state.replace(params=params, target_params=params)
