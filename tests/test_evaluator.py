"""Evaluator protocol tests (checkpoint round-robin over fixed seeds).

The frozen-baseline regression lives in test_evaluator_regression.py once
baselines are trained; here we validate the protocol machinery itself with
freshly initialized checkpoints.
"""

import os

import jax
import numpy as np
import pytest

from dronerl_tpu.agents.dqn import DQN, DQNConfig
from dronerl_tpu.evaluator.evaluator import (
    arena_params,
    evaluate_checkpoints,
)


@pytest.fixture(scope="module")
def three_checkpoints(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ckpts")
    paths = []
    for i, hidden in enumerate([(8,), (16,), (8, 8)]):
        params = arena_params(3)
        agent = DQN(DQNConfig(hidden_layers=hidden), params)
        state = agent.init_state(jax.random.PRNGKey(i))
        path = str(tmp / f"agent{i}.safetensors")
        agent.save(path, state)
        paths.append(path)
    return paths


def test_arena_sizing():
    assert arena_params(6).grid_size == 11  # ceil(sqrt(6/0.05))
    assert arena_params(6).n_drones == 6


def test_round_robin_scores(three_checkpoints):
    results = evaluate_checkpoints(
        three_checkpoints, episode_seeds=(845, 99), num_steps=50)
    assert results["mean"].shape == (3,)
    assert results["episode_scores"].shape == (2, 3)
    # scores are bounded by per-step reward bounds
    assert (results["episode_scores"] >= -50).all()
    assert (results["episode_scores"] <= 50).all()


def test_deterministic_across_runs(three_checkpoints):
    a = evaluate_checkpoints(
        three_checkpoints, episode_seeds=(17,), num_steps=30)
    b = evaluate_checkpoints(
        three_checkpoints, episode_seeds=(17,), num_steps=30)
    np.testing.assert_array_equal(a["episode_scores"], b["episode_scores"])
