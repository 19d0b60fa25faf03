"""Round-robin competition evaluator over fixed seeds.

Protocol mirror of the reference AIcrowd evaluator (reference:
drone_evaluator.py:15-218): N participating checkpoints fly in one shared
world (one drone per participant), 10 fixed episode seeds × 1000 greedy
steps, per-episode summed rewards, score = mean over episodes for the
submitted agent (secondary = std), with a rendered video of the first
episode.

TPU-native redesign: all episodes run on device at once — the seed axis is
vmapped and the 1000 steps run under one ``lax.scan``, so an evaluation is
a single compiled program per agent-set instead of a Python triple loop
(the reference steps a dict-based env 10×1000×N times on host).

Grid sizing follows the reference evaluator's drone-density rule
(``side = ceil(sqrt(n_drones / 0.05))``, reference:
torch_impl/env/env.py:75) so the arena difficulty scales with the field.

Scores are NOT numerically comparable to the reference's frozen baselines:
that would require bit-identical replication of the torch env's python
``random`` stream and its (different) collision cleanup semantics — a
non-goal for this rebuild (see PARITY.md). This repo ships its own frozen
baselines + regression lock (tests/test_evaluator.py).
"""

import logging
import math
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dronerl_tpu.agents.dqn import DQN
from dronerl_tpu.env import core as env_core
from dronerl_tpu.env.types import EnvParams

logger = logging.getLogger(__name__)

EPISODE_SEEDS = (845, 99, 65, 96, 85, 39, 51, 17, 52, 35)
TOTAL_EPISODE_STEPS = 1000
DRONE_DENSITY = 0.05


def arena_params(n_drones: int, window_radius: int = 3) -> EnvParams:
    side = int(math.ceil(math.sqrt(n_drones / DRONE_DENSITY)))
    return EnvParams(
        n_drones=n_drones, grid_size=side, window_radius=window_radius)


def evaluate_checkpoints(
    checkpoint_paths: List[str],
    episode_seeds: Tuple[int, ...] = EPISODE_SEEDS,
    num_steps: int = TOTAL_EPISODE_STEPS,
) -> Dict[str, np.ndarray]:
    """Fly one drone per checkpoint; return per-agent score stats.

    Returns dict with ``mean`` (N,), ``std`` (N,) and the raw
    ``episode_scores`` (num_episodes, N).
    """
    n = len(checkpoint_paths)
    params = arena_params(n)
    agents = []
    for path in checkpoint_paths:
        agent, net_params = DQN.restore(path, params)
        agents.append((agent, net_params))
    obs_dim = agents[0][0].obs_dim

    def episode(reset_key):
        state = env_core.reset(reset_key, params)

        def tick(carry, _):
            rng, st = carry
            rng, step_key = jax.random.split(rng)
            obs = env_core.observe(st, params).reshape(n, obs_dim)
            actions = jnp.zeros((n,), dtype=jnp.int32)
            for i, (agent, net_params) in enumerate(agents):
                q = agent.q_values(net_params, obs[i : i + 1])
                actions = actions.at[i].set(jnp.argmax(q[0]).astype(jnp.int32))
            st, rewards, _ = env_core.step(step_key, st, actions, params)
            return (rng, st), rewards

        (_, _), rewards = jax.lax.scan(
            tick, (reset_key, state), length=num_steps)
        return rewards.sum(axis=0)  # (N,) summed episode score

    keys = jax.vmap(jax.random.PRNGKey)(
        jnp.asarray(episode_seeds, dtype=jnp.uint32))
    episode_scores = np.asarray(jax.jit(jax.vmap(episode))(keys))
    return {
        "mean": episode_scores.mean(axis=0),
        "std": episode_scores.std(axis=0),
        "episode_scores": episode_scores,
    }


class DroneRacerEvaluator:
    """AIcrowd-style evaluator: frozen baselines + one submission.

    ``baseline_paths`` default to the five frozen checkpoints shipped in
    ``dronerl_tpu/evaluator/baselines/``.
    """

    def __init__(self, answer_folder_path: Optional[str] = None, round: int = 1):
        self.round = round
        base = answer_folder_path or os.path.join(
            os.path.dirname(os.path.realpath(__file__)), "baselines")
        self.participating_agents = {
            f"baseline-{i}": os.path.join(base, f"dqn-agent-{i}.safetensors")
            for i in range(1, 6)
        }
        missing = [p for p in self.participating_agents.values()
                   if not os.path.exists(p)]
        if missing:
            raise FileNotFoundError(
                f"missing baseline checkpoints: {missing}; run "
                "scripts/create_baselines.py to regenerate")

    def agent_names(self, with_submission: bool = True) -> List[str]:
        names = list(self.participating_agents)
        if with_submission:
            names.append("YOU")
        return sorted(names)

    def _evaluate(self, client_payload: dict, _context: Optional[dict] = None) -> dict:
        """Score a submission against the baselines.

        ``client_payload`` needs ``submission_file_path``; returns a dict
        with ``score``, ``score_secondary`` and ``media_video_path``.
        """
        submission = client_payload["submission_file_path"]
        paths = dict(self.participating_agents)
        paths["YOU"] = submission
        ordered_names = sorted(paths)
        ordered_paths = [paths[name] for name in ordered_names]

        results = evaluate_checkpoints(ordered_paths)
        you = ordered_names.index("YOU")

        video_path = client_payload.get("video_output_path")
        if video_path is None:
            import tempfile

            video_path = os.path.join(tempfile.mkdtemp(), "episode0.mp4")
        video_path = self._render_first_episode(ordered_paths, ordered_names,
                                                video_path)
        logger.info("evaluator scores: %s",
                    dict(zip(ordered_names, results["mean"])))
        return {
            "score": float(results["mean"][you]),
            "score_secondary": float(results["std"][you]),
            "media_video_path": video_path,
            "all_scores": dict(
                zip(ordered_names, results["mean"].tolist())),
        }

    def _render_first_episode(self, paths, names, output_path,
                              num_frames: int = 60) -> str:
        from dronerl_tpu.render.renderer import Renderer
        from dronerl_tpu.render.video import encode_video

        n = len(paths)
        params = arena_params(n)
        agents = [DQN.restore(p, params) for p in paths]
        obs_dim = agents[0][0].obs_dim
        rng = jax.random.PRNGKey(EPISODE_SEEDS[0])
        state = jax.jit(env_core.reset, static_argnames=("params",))(
            rng, params)
        step_fn = jax.jit(env_core.step, static_argnames=("params",))
        obs_fn = jax.jit(env_core.observe, static_argnames=("params", "limit"))

        renderer = Renderer(
            n, params.grid_size,
            player_name_mappings=dict(enumerate(names)),
            resolution_scale_factor=2.0)
        renderer.init()
        frames = [renderer.render_state(state)]
        for _ in range(num_frames):
            rng, step_key = jax.random.split(rng)
            obs = obs_fn(state, params=params).reshape(n, obs_dim)
            acts = []
            for i, (agent, net_params) in enumerate(agents):
                q = agent.q_values(net_params, obs[i : i + 1])
                acts.append(int(jnp.argmax(q[0])))
            actions = jnp.asarray(acts, dtype=jnp.int32)
            state, rewards, _ = step_fn(step_key, state, actions, params=params)
            host = jax.device_get((state, rewards, actions))
            frames.append(renderer.render_frame(
                np.asarray(host[0].ground), np.asarray(host[0].air_x),
                np.asarray(host[0].air_y),
                np.asarray(host[0].carrying_package),
                np.asarray(host[0].charge), np.asarray(host[1]),
                np.asarray(host[2])))
        return encode_video(frames, output_path)
