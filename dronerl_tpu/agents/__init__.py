"""Agents: on-device DQN actor-learner and a random baseline."""

from dronerl_tpu.agents.dqn import DQN, DQNConfig, DQNState, DenseQNet, ConvQNet
from dronerl_tpu.agents.random_agent import random_actions

__all__ = [
    "DQN",
    "DQNConfig",
    "DQNState",
    "DenseQNet",
    "ConvQNet",
    "random_actions",
]
