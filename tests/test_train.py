"""Trainer integration tests: smoke run, eval, resume, sharded run."""

import os

import jax
import numpy as np
import pytest

from dronerl_tpu import train as train_mod


def make_args(tmp_path, **overrides):
    argv = []
    defaults = dict(
        num_steps=60,
        num_envs=2,
        memory_size=256,
        batch_size=8,
        num_eval_steps=50,
        num_evals=2,
        run_dir=str(tmp_path / "run"),
        jax_cache_dir="/root/repo/.jax_cache",
    )
    defaults.update(overrides)
    flags = []
    for key, value in defaults.items():
        if isinstance(value, bool):
            if value:
                flags.append(f"--{key}")
        elif isinstance(value, (list, tuple)):
            flags.append(f"--{key}")
            flags.extend(str(v) for v in value)
        else:
            flags.extend([f"--{key}", str(value)])
    return train_mod.parse_args(flags + argv)


def test_train_smoke(tmp_path):
    args = make_args(tmp_path, save_final_checkpoint=True)
    metrics = train_mod.train(args)
    assert metrics["obs_per_sec"] > 0
    assert "eval_reward_mean" in metrics
    files = os.listdir(args.run_dir)
    assert any(f.endswith("_jax.safetensors") for f in files)
    assert any(f.endswith("_torch.safetensors") for f in files)
    assert "metrics.json" in files


def test_fast_rng_cli_modes():
    """--fast_rng {off,actor,full} → (rng_rounds, actor_rng_rounds).

    'actor' is the hybrid (env uniforms stay at the parity-locked 20
    rounds, only the in-kernel ε-greedy actor rows drop to 8); the bare
    flag keeps its pre-round-5 meaning ('full'), as does a legacy
    boolean True attribute."""
    translate = train_mod.rng_rounds_from_args
    assert translate(train_mod.parse_args([])) == (20, None)
    assert translate(train_mod.parse_args(["--fast_rng", "off"])) == \
        (20, None)
    assert translate(train_mod.parse_args(["--fast_rng", "actor"])) == \
        (20, 8)
    assert translate(train_mod.parse_args(["--fast_rng", "full"])) == \
        (8, None)
    assert translate(train_mod.parse_args(["--fast_rng"])) == (8, None)

    class LegacyArgs:
        fast_rng = True

    assert translate(LegacyArgs()) == (8, None)


def test_train_collect_all_drones(tmp_path):
    args = make_args(tmp_path, collect_drones=4, skip_final_eval=True)
    metrics = train_mod.train(args)
    assert metrics["obs_per_sec"] > 0


def test_train_sharded_envs(tmp_path):
    # 8 virtual CPU devices from conftest; envs divisible by devices.
    args = make_args(
        tmp_path, num_envs=8, use_sharding=True, skip_final_eval=True)
    metrics = train_mod.train(args)
    assert metrics["obs_per_sec"] > 0


def test_save_and_resume_train_state(tmp_path):
    args = make_args(tmp_path, save_train_state=True, skip_final_eval=True)
    train_mod.train(args)
    state_path = os.path.join(args.run_dir, "train_state.msgpack")
    assert os.path.exists(state_path)

    resume_args = make_args(
        tmp_path, skip_final_eval=True,
        run_dir=str(tmp_path / "run2"))
    resume_args.resume_from = state_path
    metrics = train_mod.train(resume_args)
    assert metrics["obs_per_sec"] > 0


def test_resume_bitwise_equivalence(tmp_path):
    """train(2N) ≡ train(N) + resume + train(N): the final serialized
    carries (params, opt state, ε, buffer, env states, step) must be
    bitwise identical. ε decay is pinned explicitly because the derived
    decay depends on --num_steps."""
    from flax import serialization

    common = dict(skip_final_eval=True, save_train_state=True,
                  epsilon_decay=0.995)
    full = make_args(tmp_path, num_steps=60,
                     run_dir=str(tmp_path / "full"), **common)
    train_mod.train(full)

    half1 = make_args(tmp_path, num_steps=30,
                      run_dir=str(tmp_path / "half1"), **common)
    train_mod.train(half1)
    half2 = make_args(tmp_path, num_steps=30,
                      run_dir=str(tmp_path / "half2"), **common)
    half2.resume_from = os.path.join(half1.run_dir, "train_state.msgpack")
    train_mod.train(half2)

    def load(run_dir):
        with open(os.path.join(run_dir, "train_state.msgpack"), "rb") as f:
            return serialization.msgpack_restore(f.read())

    a, b = load(full.run_dir), load(half2.run_dir)
    leaves_a, treedef_a = jax.tree.flatten(a)
    leaves_b, treedef_b = jax.tree.flatten(b)
    assert treedef_a == treedef_b
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_resume_bitwise_equivalence_sharded(tmp_path):
    """The resume lock for the SHARDED trainer: the restore template is
    a mesh-sharded carry (8 virtual CPU devices), so this guards both
    the pytree structure and the resharding of restored host arrays
    back onto the ('dp',) mesh."""
    from flax import serialization

    common = dict(num_envs=8, use_sharding=True, skip_final_eval=True,
                  save_train_state=True, epsilon_decay=0.995)
    full = make_args(tmp_path, num_steps=60,
                     run_dir=str(tmp_path / "full"), **common)
    train_mod.train(full)

    half1 = make_args(tmp_path, num_steps=30,
                      run_dir=str(tmp_path / "half1"), **common)
    train_mod.train(half1)
    half2 = make_args(tmp_path, num_steps=30,
                      run_dir=str(tmp_path / "half2"), **common)
    half2.resume_from = os.path.join(half1.run_dir, "train_state.msgpack")
    train_mod.train(half2)

    def load(run_dir):
        with open(os.path.join(run_dir, "train_state.msgpack"), "rb") as f:
            return serialization.msgpack_restore(f.read())

    a, b = load(full.run_dir), load(half2.run_dir)
    leaves_a, treedef_a = jax.tree.flatten(a)
    leaves_b, treedef_b = jax.tree.flatten(b)
    assert treedef_a == treedef_b
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_warm_start_installs_checkpoint_params(tmp_path):
    """--load_from_checkpoint seeds online + target nets from the file;
    network topology comes from the checkpoint metadata, not the CLI."""
    from safetensors.numpy import load_file

    src = make_args(tmp_path, num_steps=20, skip_final_eval=True,
                    save_final_checkpoint=True,
                    hidden_layers=(12, 6),  # differs from the CLI default
                    run_dir=str(tmp_path / "src"))
    train_mod.train(src)
    ckpt = os.path.join(src.run_dir, "agent_20_steps_jax.safetensors")
    assert os.path.exists(ckpt)

    # 2 steps x 2 envs < batch_size pushes: no gradient step happens, so
    # the final save must equal the warm-start source exactly.
    warm = make_args(tmp_path, num_steps=2, skip_final_eval=True,
                     save_final_checkpoint=True,
                     run_dir=str(tmp_path / "warm"))
    warm.load_from_checkpoint = ckpt
    train_mod.train(warm)
    out = os.path.join(warm.run_dir, "agent_2_steps_jax.safetensors")

    src_tensors = load_file(ckpt)
    out_tensors = load_file(out)
    assert set(src_tensors) == set(out_tensors)  # (12, 6) topology kept
    for key in src_tensors:
        np.testing.assert_array_equal(src_tensors[key], out_tensors[key])


def test_warm_start_sharded(tmp_path):
    """--load_from_checkpoint composes with --use_sharding: the loaded
    params replace the replicated learner state across the mesh."""
    from safetensors.numpy import load_file

    src = make_args(tmp_path, num_steps=10, skip_final_eval=True,
                    save_final_checkpoint=True,
                    run_dir=str(tmp_path / "src"))
    train_mod.train(src)
    ckpt = os.path.join(src.run_dir, "agent_10_steps_jax.safetensors")

    warm = make_args(tmp_path, num_steps=2, num_envs=8, use_sharding=True,
                     batch_size=64,  # 8 per shard: buffers stay cold
                     skip_final_eval=True, save_final_checkpoint=True,
                     run_dir=str(tmp_path / "warm_sharded"))
    warm.load_from_checkpoint = ckpt
    train_mod.train(warm)
    # 2 steps x 1 env/shard < 8-per-shard batch -> no gradient step:
    # the final save must equal the warm-start source exactly.
    out = os.path.join(warm.run_dir, "agent_2_steps_jax.safetensors")
    src_tensors, out_tensors = load_file(ckpt), load_file(out)
    for key in src_tensors:
        np.testing.assert_array_equal(src_tensors[key], out_tensors[key])


class ProbeLogger:
    def __init__(self):
        self.records = []
        self.histograms = []

    def log_scalar(self, tag, value, step):
        self.records.append((tag, value, step))

    def log_scalars(self, values, step):
        for tag, value in values.items():
            self.log_scalar(tag, value, step)

    def log_histogram(self, tag, values, step):
        self.histograms.append((tag, np.asarray(values), step))

    def close(self):
        pass


def test_per_chunk_metrics_logged(tmp_path):
    """The trainer logs per-chunk mean reward, ε and TD loss through the
    pluggable logging layer (one record per scan chunk)."""
    args = make_args(tmp_path, num_steps=40, max_scan_steps=10,
                     skip_final_eval=True)
    probe = ProbeLogger()
    train_mod.train(args, metrics_logger=probe)
    by_tag = {}
    for tag, value, step in probe.records:
        by_tag.setdefault(tag, []).append((step, value))
    assert set(by_tag) >= {"train_reward", "epsilon", "td_loss"}
    for tag in ("train_reward", "epsilon", "td_loss"):
        assert [s for s, _ in by_tag[tag]] == [10, 20, 30, 40]
        assert all(np.isfinite(v) for _, v in by_tag[tag])
    # ε actually decays over chunks
    eps = [v for _, v in by_tag["epsilon"]]
    assert eps[-1] < eps[0]
    # Per-chunk histograms are wired (the reference's TensorBoard
    # histograms, torch_impl/agents/dqn.py:371-374,416-419): q-values on
    # a replay probe, trained-step TD losses, replay action column.
    hist_tags = {tag for tag, _, _ in probe.histograms}
    assert hist_tags >= {"q_values", "td_loss", "replay_actions"}
    for tag, values, _ in probe.histograms:
        if tag == "q_values":
            assert values.shape[-1] == 5 and np.isfinite(values).all()
        if tag == "td_loss":
            assert (values != 0.0).all()  # warm-up ticks masked out


def test_tau_reaches_agent_config():
    """--tau must feed optax.incremental_update's interpolation (the
    reference trainer wires it: train_jax.py:149); it was once parsed
    but silently dropped."""
    args = train_mod.parse_args(["--tau", "0.25"])
    assert train_mod.agent_config_from_args(args).tau == 0.25


def test_eval_grid_size_rejected_for_global_wrapper():
    """A different eval arena is impossible with full-grid observations
    (obs_dim IS the grid); must fail at parse/validation time, not after
    training completes."""
    args = train_mod.parse_args(
        ["--wrapper", "global", "--eval_grid_size", "12"])
    with pytest.raises(ValueError, match="global"):
        train_mod.env_params_from_args(args, eval_mode=True)
    # An overfull eval arena (40 default objects on 9 cells) must also
    # fail at validation time, not after training completes.
    args = train_mod.parse_args(["--eval_grid_size", "3"])
    with pytest.raises(ValueError, match="cells"):
        train_mod.env_params_from_args(args, eval_mode=True)


def test_ring_histograms_mask_unwritten_slots(tmp_path):
    """The ring-engine histogram probe must only read slots the kernel
    has actually written (obs slot 0 is seeded pre-run; scalars land at
    the read slot), and with collect_drones>1 it probes drone 0's row —
    not all k rows — as its docstring promises."""
    import jax
    import jax.numpy as jnp

    from dronerl_tpu.agents.dqn import DQN

    args = make_args(tmp_path)
    agent = DQN(
        train_mod.agent_config_from_args(args),
        train_mod.env_params_from_args(args))
    env_params = train_mod.env_params_from_args(args)
    num_envs, capacity, k = 8, 32, 2
    carry = train_mod.init_ring_carry(
        agent, env_params, num_envs, capacity, jax.random.PRNGKey(0),
        collect_drones=k)
    rng, (tstate, ring), (a, r, d), ag_state, u, _step = carry
    # Distinguishable scalar rings: drone 0 all action 1, drone 1 all 2.
    a = a.at[0].set(1).at[1].set(2)

    # steps_done = 0: nothing written yet — no q/action histograms.
    probe = ProbeLogger()
    zero_carry = (rng, (tstate, ring), (a, r, d), ag_state, u, jnp.array(0))
    train_mod.log_chunk_histograms(
        probe, agent, zero_carry, jnp.zeros((4,)), use_ring=True,
        use_fused=False, step=0)
    assert not {t for t, _, _ in probe.histograms} & {
        "q_values", "replay_actions"}

    # steps_done = 2: 2 scalar slots (16 entries) and 3 obs slots valid.
    probe = ProbeLogger()
    two_carry = (rng, (tstate, ring), (a, r, d), ag_state, u, jnp.array(2))
    train_mod.log_chunk_histograms(
        probe, agent, two_carry, jnp.zeros((4,)), use_ring=True,
        use_fused=False, step=2)
    hists = {t: v for t, v, _ in probe.histograms}
    assert (hists["replay_actions"] == 1).all()  # drone 0's row only
    assert hists["replay_actions"].shape == (2 * num_envs,)
    assert hists["q_values"].shape[0] <= 3 * num_envs


def test_eval_returns_reasonable_stats(tmp_path):
    args = make_args(tmp_path, skip_final_eval=True)
    from dronerl_tpu.agents.dqn import DQN

    agent = DQN(
        train_mod.agent_config_from_args(args),
        train_mod.env_params_from_args(args))
    import jax

    ag_state = agent.init_state(jax.random.PRNGKey(0))
    (mean, std), (rmean, rstd) = train_mod.evaluate(args, agent, ag_state)
    # rewards per step are bounded by [-1, 1]
    assert -1.0 <= mean <= 1.0
    assert -1.0 <= rmean <= 1.0
    assert std >= 0.0


def test_eval_tick_streams_are_independent():
    """The opponents' randint, the agent's act call, the env step, and
    the scan carry must each consume a DISTINCT key (VERDICT-r3 #9: the
    greedy path ignores its key today, so reusing the opponents' key was
    invisible — until someone adds ε-eval and the two streams correlate)."""
    rng = jax.random.PRNGKey(7)
    keys = train_mod._eval_tick_keys(rng)
    assert len(keys) == 4
    raw = [np.asarray(jax.random.key_data(k)).tobytes() for k in keys]
    assert len(set(raw)) == 4, "eval tick keys are not pairwise distinct"
    # And the eval tick body actually consumes them as separate streams.
    import inspect
    import re

    src = inspect.getsource(train_mod.evaluate)
    assert re.search(r"randint\(\s*opp_key", src), (
        "opponents' actions must draw from their own opp_key")
    assert re.search(r"agent\.act\(act_key", src), (
        "the agent's act call must use the dedicated act_key")


def test_eval_fn_cache_key_tracks_forward_affecting_fields():
    """Cache keying is full-config-minus-denylist: learner-only hypers
    share one traced program; any other (incl. future) field re-traces
    (ADVICE-r3: manual field enumeration would silently reuse a stale
    program when a forward-affecting field is added)."""
    from dronerl_tpu.agents.dqn import DQNConfig

    base = DQNConfig(hidden_layers=(8, 8))
    # Learner-only hypers normalize to the same key.
    assert train_mod._eval_forward_key(base) == train_mod._eval_forward_key(
        DQNConfig(hidden_layers=(8, 8), learning_rate=0.5, gamma=0.1,
                  tau=0.3, target_update_interval=77,
                  epsilon_start=0.2, epsilon_end=0.002,
                  epsilon_decay=0.5, epsilon_decay_every=3))
    # Forward-affecting fields do not.
    assert train_mod._eval_forward_key(base) != train_mod._eval_forward_key(
        DQNConfig(hidden_layers=(8, 16)))
    assert train_mod._eval_forward_key(base) != train_mod._eval_forward_key(
        DQNConfig(hidden_layers=(8, 8), network_type="conv"))
    # The denylist must name real DQNConfig fields (a renamed field
    # would make dataclasses.replace raise, but assert it loudly here).
    import dataclasses

    names = {f.name for f in dataclasses.fields(DQNConfig)}
    assert set(train_mod._LEARNER_ONLY_FIELDS) <= names


def test_no_train_sentinel_is_negative_and_masked(tmp_path):
    """Warm-up ticks emit NO_TRAIN_LOSS (< 0); the logged td_loss mask
    keeps a genuine 0.0 loss and skips the scalar when the whole chunk
    was warm-up (ADVICE-r3: the old 0.0 sentinel conflated both)."""
    from dronerl_tpu.constants import NO_TRAIN_LOSS

    assert NO_TRAIN_LOSS < 0.0

    class ProbeLogger:
        def __init__(self):
            self.scalars = []

        def log_scalars(self, scalars, step):
            self.scalars.append(dict(scalars))

        def log_histogram(self, *a, **k):
            pass

    # A run short enough that every tick is warm-up (batch_size 8,
    # memory warm-up > num_steps * num_envs experiences is impossible
    # here, so instead check the masking arithmetic directly).
    import jax.numpy as jnp

    losses = jnp.array([NO_TRAIN_LOSS, NO_TRAIN_LOSS, 0.0, 2.0])
    flat = jnp.ravel(losses)
    trained = flat >= 0.0
    assert int(jnp.sum(trained)) == 2
    td = float(jnp.sum(jnp.where(trained, flat, 0.0)) / 2)
    assert td == 1.0  # genuine zero loss kept, sentinel excluded


def test_ring_skip_reasons_name_the_gate_and_the_lever():
    """Falling off the ring engine is an explained perf cliff: each
    auto-select gate produces a reason naming the config lever that
    re-enables the fastest engine (VERDICT-r2: gates were tested only
    for rejection, not for the cliff a user hits crossing them)."""
    from dronerl_tpu.train import ring_skip_reasons

    # conv without the im2col lowering
    msgs = ring_skip_reasons(False, 1024, 512, 8, 1)
    assert any("--conv_matmul" in m for m in msgs)
    # ring too large relative to the env batch (donation constraint)
    msgs = ring_skip_reasons(True, 100_000, 512, 8, 1)
    assert any("--memory_size" in m and "4 env-batches" in m
               for m in msgs)
    # batch not divisible by collect_drones
    msgs = ring_skip_reasons(True, 1024, 512, 9, 2)
    assert any("--collect_drones" in m for m in msgs)
    # a ring-eligible config yields no reasons
    assert ring_skip_reasons(True, 2048, 512, 8, 2) == []


def test_fused_engine_problems_divisibility():
    """num_envs not a multiple of 128 is a readable pre-empted problem.

    Guards the ADVICE-r2 fix: 192 envs used to pass the >=128 gate and
    then die inside Mosaic with an opaque layout error.
    """
    from dronerl_tpu.env.types import EnvParams
    from dronerl_tpu.train import fused_engine_problems

    params = EnvParams(grid_size=9, n_drones=4)
    msgs = fused_engine_problems(params, 192)
    assert any("multiple of 128" in m for m in msgs)
    msgs_small = fused_engine_problems(params, 64)
    assert any("< 128" in m for m in msgs_small)
    # well-formed batch: no env-count problem reported
    msgs_ok = fused_engine_problems(params, 1024)
    assert not any("128" in m for m in msgs_ok)
