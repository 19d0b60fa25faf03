"""Trainer integration tests: smoke run, eval, resume, sharded run."""

import os

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
