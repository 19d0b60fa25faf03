"""Auxiliary subsystems: notebook helpers, metric loggers, profiling,
sweep config, benchmark harness wiring."""

import logging

import jax
import numpy as np
import pytest

from dronerl_tpu import helpers
from dronerl_tpu.env.gymapi import DeliveryDronesEnv
from dronerl_tpu.utils import metrics, profiling


class TestHelpers:
    def test_multi_agent_trainer_runs_and_records_rewards(self):
        helpers.set_seed(7)
        env = DeliveryDronesEnv({"n_drones": 3, "grid_size": 8})
        agents = {i: helpers.RandomHostAgent() for i in range(3)}
        trainer = helpers.MultiAgentTrainer(env, agents, seed=7)
        trainer.train(25)
        assert set(trainer.rewards_log) == {0, 1, 2}
        assert all(len(v) == 25 for v in trainer.rewards_log.values())

    def test_test_agents_returns_per_drone_rewards(self):
        env = DeliveryDronesEnv({"n_drones": 2, "grid_size": 8})
        agents = {i: helpers.RandomHostAgent() for i in range(2)}
        rewards = helpers.test_agents(env, agents, n_steps=10, seed=3)
        assert set(rewards) == {0, 1}
        assert len(rewards[0]) == 10

    def test_plots_render_to_files(self, tmp_path):
        import matplotlib

        matplotlib.use("Agg")
        log = {0: [0.1, -1.0, 1.0] * 10, 1: [0.0] * 30}
        ax = helpers.plot_cumulative_rewards(log, drone_ids=[0])
        ax.figure.savefig(tmp_path / "cum.png")
        ax2 = helpers.plot_rolling_rewards(log, window=5)
        ax2.figure.savefig(tmp_path / "roll.png")
        assert (tmp_path / "cum.png").exists()
        assert (tmp_path / "roll.png").exists()


class TestMetrics:
    def test_stdout_and_no_logger(self, caplog):
        lg = metrics.StdoutLogger()
        with caplog.at_level(logging.INFO, logger="dronerl_tpu.utils.metrics"):
            lg.log_scalar("loss", 0.5, 10)
            lg.log_scalars({"a": 1.0, "b": 2.0}, 11)
            lg.log_histogram("q", np.arange(10.0), 12)
        assert any("loss" in r.message for r in caplog.records)
        nl = metrics.NoLogger()
        nl.log_scalar("x", 1.0, 0)
        nl.log_histogram("x", [1.0], 0)

    def test_multiplexer_fans_out(self):
        calls = []

        class Probe(metrics.Logger):
            def log_scalar(self, tag, value, step):
                calls.append((tag, value, step))

            def log_histogram(self, tag, values, step):
                calls.append((tag, "hist", step))

        mux = metrics.MultiLogger([Probe(), Probe()])
        mux.log_scalar("m", 3.0, 1)
        assert calls == [("m", 3.0, 1)] * 2

    def test_tensorboard_logger_writes(self, tmp_path):
        try:
            lg = metrics.TensorBoardLogger(str(tmp_path))
        except ImportError:
            pytest.skip("tensorboard writer unavailable")
        lg.log_scalar("loss", 1.0, 0)
        lg.log_histogram("q", np.arange(8.0), 0)
        lg.close()
        assert any(tmp_path.iterdir())


class TestProfiling:
    def test_stopwatch_and_memory_stats(self):
        with profiling.Stopwatch() as sw:
            x = jax.numpy.ones((8, 8)).sum()
            elapsed = sw.stop(x)
        assert elapsed >= 0.0
        stats = profiling.device_memory_stats()
        assert isinstance(stats, dict)
        profiling.log_device_memory("test: ")

    def test_trace_context(self, tmp_path):
        with profiling.trace(str(tmp_path)):
            jax.block_until_ready(jax.numpy.ones((4,)) * 2)
        assert any(tmp_path.rglob("*"))


def test_sweep_config_surface():
    from dronerl_tpu import sweep

    params = sweep.SWEEP_CONFIG["parameters"]
    assert sweep.SWEEP_CONFIG["method"] == "bayes"
    for key in ("topology", "num_envs", "learning_rate",
                "epsilon_end", "batch_size",
                # Learner schedule + env shaping — the reference torch
                # sweep's space (reference: torch_impl/sweep.py:96-127).
                "gamma", "target_update_interval", "epsilon_decay_every",
                "memory_size", "n_drones", "pickup_reward"):
        assert key in params
    # Topology is joint (network type + matching layer widths) so the
    # bayes search never varies a dimension the chosen net ignores.
    topos = params["topology"]["values"]
    assert any(t.startswith("dense:") for t in topos)
    assert any(t.startswith("conv") for t in topos)
    # Every swept parameter must be wired into the trial argv (a swept
    # but unwired hyper silently wastes the whole bayes dimension).
    import inspect

    src = inspect.getsource(sweep.run_trial)
    for key in params:
        if key == "topology":
            continue
        assert f"cfg.{key}" in src, f"swept parameter {key} not wired"


def test_benchmark_single_config_runs():
    from dronerl_tpu import benchmark

    row = benchmark.bench_config(
        "Default", {}, n_drones=3, steps=5, num_envs=8)
    for key in ("env_steps_per_s", "act_steps_per_s", "learn_steps_per_s",
                "fused_obs_per_s"):
        assert row[key] > 0


def test_tpu_numerics_lock_record_schema():
    """Schema guard for the on-chip numerics record (recorded by
    scripts/tpu_numerics_lock.py on the real chip; this CPU test only
    validates its structure so a malformed re-record fails CI)."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "tpu_numerics_lock.json")
    if not os.path.exists(path):
        pytest.skip("TPU numerics record not yet frozen")
    with open(path) as f:
        rec = json.load(f)
    for section in ("int_digests", "env_floats", "learner", "meta"):
        assert section in rec
    assert rec["int_digests"], "no integer digests recorded"
    for name, digest in rec["int_digests"].items():
        assert isinstance(digest, str) and len(digest) == 64, name
    ef = rec["env_floats"]
    assert ef["ring_nonzero"] > 0
    assert len(ef["ring_sample"]) > 0
    lr = rec["learner"]
    assert len(lr["param_abs_sums"]) >= 4  # (16,16) net: 3 layers W+b
    assert np.isfinite(lr["q_probe"]).all()
    assert rec["meta"]["platform"] != "cpu", (
        "the frozen record must come from the real chip")
