"""Renderer + video smoke tests."""

import os

import jax
import numpy as np

from dronerl_tpu.agents.dqn import DQN, DQNConfig
from dronerl_tpu.env import core as env_core
from dronerl_tpu.env.types import EnvParams
from dronerl_tpu.render import Renderer, encode_video, render_policy_video


def test_render_frame_shape_and_determinism():
    params = EnvParams()
    state = env_core.reset(jax.random.PRNGKey(0), params)
    renderer = Renderer(params.n_drones, params.grid_size)
    renderer.init()
    img = renderer.render_state(state)
    assert img.width > 0 and img.height > 0
    arr = np.asarray(img)
    assert arr.ndim == 3 and arr.shape[2] == 3
    assert arr.max() > 0  # not a blank frame


def test_render_scale_factor():
    params = EnvParams()
    state = env_core.reset(jax.random.PRNGKey(0), params)
    r1 = Renderer(params.n_drones, params.grid_size)
    r2 = Renderer(params.n_drones, params.grid_size,
                  resolution_scale_factor=2.0)
    r1.init()
    r2.init()
    img1, img2 = r1.render_state(state), r2.render_state(state)
    assert img2.width == 2 * img1.width


def test_video_roundtrip(tmp_path):
    params = EnvParams(grid_size=6, n_drones=2, skyscrapers_factor=1,
                       packets_factor=1, dropzones_factor=1,
                       stations_factor=1)
    agent = DQN(DQNConfig(hidden_layers=(8,)), params)
    ag_state = agent.init_state(jax.random.PRNGKey(0))
    out = str(tmp_path / "episode.mp4")
    written = render_policy_video(
        params, agent, ag_state, out, num_steps=5, fps=4)
    assert os.path.exists(written)
    assert os.path.getsize(written) > 1000
