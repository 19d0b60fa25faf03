"""Episode video rendering: on-device rollout → PIL frames → mp4.

Encoding prefers OpenCV's built-in mp4 writer (no external binary), falls
back to an ``ffmpeg`` subprocess if present, and to an animated GIF as the
last resort. The rollout half mirrors the reference's render path
(reference: jax_impl/render_util.py:33-73): greedy DQN drone 0 vs random
opponents, jitted act/step/observe, device→host fetch once per frame.
"""

import os
import shutil
import subprocess
import tempfile
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from dronerl_tpu.constants import NUM_ACTIONS
from dronerl_tpu.env import core as env_core
from dronerl_tpu.env.types import EnvParams
from dronerl_tpu.render.renderer import Renderer


def encode_video(
    frames: List[Image.Image],
    output_path: str,
    fps: int = 4,
) -> str:
    """Encode PIL frames to a video file. Returns the written path."""
    if not frames:
        raise ValueError("no frames to encode")
    try:
        import cv2

        h, w = frames[0].height, frames[0].width
        # mp4 encoders want even dimensions
        w2, h2 = w - (w % 2), h - (h % 2)
        fourcc = cv2.VideoWriter_fourcc(*"mp4v")
        writer = cv2.VideoWriter(output_path, fourcc, fps, (w2, h2))
        if writer.isOpened():
            for frame in frames:
                arr = np.asarray(frame.convert("RGB"))[:h2, :w2, ::-1]
                writer.write(np.ascontiguousarray(arr))
            writer.release()
            return output_path
    except ImportError:
        pass

    if shutil.which("ffmpeg"):
        with tempfile.TemporaryDirectory() as tmp:
            for i, frame in enumerate(frames):
                frame.save(os.path.join(tmp, f"{i:04d}.png"))
            cmd = [
                "ffmpeg", "-y", "-r", str(fps), "-start_number", "0",
                "-i", os.path.join(tmp, "%04d.png"),
                "-c:v", "libx264", "-vf", f"fps={fps}",
                "-pix_fmt", "yuv420p", output_path,
            ]
            result = subprocess.run(cmd, capture_output=True)
            if result.returncode != 0:
                raise RuntimeError(result.stderr.decode())
        return output_path

    # last resort: animated GIF next to the requested path
    gif_path = os.path.splitext(output_path)[0] + ".gif"
    frames[0].save(
        gif_path, save_all=True, append_images=frames[1:],
        duration=int(1000 / fps), loop=0)
    return gif_path


def render_policy_video(
    env_params: EnvParams,
    agent,
    ag_state,
    output_path: str,
    num_steps: int = 200,
    seed: int = 0,
    fps: int = 4,
    renderer: Optional[Renderer] = None,
) -> str:
    """Roll out greedy-drone-0 vs randoms and encode the episode."""
    rng = jax.random.PRNGKey(seed)
    state = jax.jit(env_core.reset, static_argnames=("params",))(
        rng, env_params)
    step_fn = jax.jit(env_core.step, static_argnames=("params",))
    obs_fn = jax.jit(env_core.observe, static_argnames=("params", "limit"))

    if renderer is None:
        renderer = Renderer(env_params.n_drones, env_params.grid_size,
                            resolution_scale_factor=2.0)
    if not renderer.is_initialized:
        renderer.init()

    frames = [renderer.render_state(state)]
    for _ in range(num_steps):
        rng, act_key, step_key = jax.random.split(rng, 3)
        actions = jax.random.randint(
            act_key, (env_params.n_drones,), 0, NUM_ACTIONS)
        obs = obs_fn(state, params=env_params, limit=1).reshape(1, agent.obs_dim)
        greedy = agent.act(act_key, obs, ag_state, greedy=True)[0]
        actions = actions.at[0].set(greedy)
        state, rewards, _ = step_fn(step_key, state, actions, params=env_params)
        host = jax.device_get((state, rewards, actions))
        frames.append(renderer.render_frame(
            np.asarray(host[0].ground), np.asarray(host[0].air_x),
            np.asarray(host[0].air_y), np.asarray(host[0].carrying_package),
            np.asarray(host[0].charge), np.asarray(host[1]),
            np.asarray(host[2])))
    return encode_video(frames, output_path, fps=fps)
