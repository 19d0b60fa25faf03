"""Gym-style imperative API tests."""

import numpy as np

from dronerl_tpu.env.gymapi import DeliveryDronesEnv
from dronerl_tpu.helpers import MultiAgentTrainer, RandomHostAgent, set_seed
from dronerl_tpu.helpers import test_agents as run_eval_agents


def test_reset_and_step_surface():
    env = DeliveryDronesEnv({"n_drones": 3})
    obs, info = env.reset(seed=0)
    assert set(obs) == {0, 1, 2}
    assert obs[0].shape == (7, 7, 6)
    next_obs, rewards, dones, truncated, extra = env.step({0: 2, 1: 4, 2: 0})
    assert set(rewards) == {0, 1, 2}
    assert isinstance(rewards[0], float)
    assert isinstance(dones[0], bool)
    assert truncated is False


def test_density_grid_sizing():
    env = DeliveryDronesEnv({"n_drones": 5, "drone_density": 0.05})
    assert env.side_size == 10  # ceil(sqrt(5/0.05)) = 10


def test_explicit_grid_size_override():
    env = DeliveryDronesEnv({"n_drones": 2, "grid_size": 12})
    assert env.side_size == 12


def test_grid_view_wrapper():
    env = DeliveryDronesEnv({"n_drones": 2, "grid_size": 8}, wrapper="global")
    obs, _ = env.reset(seed=1)
    assert obs[0].shape == (8, 8, 6)
    np.testing.assert_array_equal(obs[0], obs[1])


def test_ansi_render():
    env = DeliveryDronesEnv({"n_drones": 2})
    env.reset(seed=0)
    board = env.render()
    assert isinstance(board, str) and len(board.splitlines()) == env.side_size


def test_multi_agent_trainer_loop():
    set_seed(0)
    env = DeliveryDronesEnv({"n_drones": 2, "grid_size": 8})
    agents = {0: RandomHostAgent(), 1: RandomHostAgent()}
    trainer = MultiAgentTrainer(env, agents, seed=0)
    trainer.train(20)
    assert len(trainer.rewards_log[0]) == 20
    log = run_eval_agents(env, agents, n_steps=10)
    assert len(log[0]) == 10
