"""Bit-exactness of the fused Pallas step kernel vs the jnp kernels.

Runs the Pallas interpreter on CPU (tests) — the identical kernel code
compiles for TPU in production. The contract under test:

    step_batch_fused(step_key, states, actions, params)
        == vmap(core.step)(jax.random.split(step_key, E), states, actions)

with EXACT array equality (the jnp path is itself bit-exact with the
reference env, so transitivity extends the reference-parity guarantee to
the kernel).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dronerl_tpu.env import core as env_core
from dronerl_tpu.env.types import EnvParams
from dronerl_tpu.ops import step_kernel


class TestThreefryParity:
    def test_hash_matches_jax_primitive(self):
        from jax._src import prng as jax_prng

        for seed in (0, 1, 123456789):
            k = jax.random.PRNGKey(seed)
            counts = jnp.arange(81, dtype=jnp.uint32)
            ours = step_kernel.threefry2x32(
                k[0], k[1], jnp.zeros_like(counts), counts)
            ref = jax_prng.threefry2x32_p.bind(
                k[0], k[1], jnp.zeros_like(counts), counts)
            assert (ours[0] == ref[0]).all()
            assert (ours[1] == ref[1]).all()

    def test_uniform_bits_match_jax_random(self):
        k = jax.random.PRNGKey(7)
        ref = jax.random.uniform(k, (81,))
        b1, b2 = step_kernel.threefry2x32(
            k[0], k[1], jnp.zeros((81,), jnp.uint32),
            jnp.arange(81, dtype=jnp.uint32))
        bits = b1 ^ b2
        fbits = (bits >> jnp.uint32(9)) | jnp.uint32(0x3F800000)
        ours = jax.lax.bitcast_convert_type(fbits, jnp.float32) - 1.0
        assert (ref == ours).all()

    def test_split_matches_jax_random(self):
        k = jax.random.PRNGKey(99)
        ref = jax.random.split(k, 13)
        n = jnp.arange(13, dtype=jnp.uint32)
        b1, b2 = step_kernel.threefry2x32(k[0], k[1], jnp.zeros_like(n), n)
        assert (ref[:, 0] == b1).all()
        assert (ref[:, 1] == b2).all()


def _assert_states_equal(a, b, context):
    for field in ("ground", "air_x", "air_y", "carrying_package", "charge"):
        av = np.asarray(getattr(a, field))
        bv = np.asarray(getattr(b, field))
        assert (av == bv).all(), f"{context}: field {field} diverged"


@pytest.mark.slow
@pytest.mark.parametrize(
    "params",
    [
        EnvParams(grid_size=9, n_drones=4),
        EnvParams(grid_size=8, n_drones=3),
        EnvParams(grid_size=11, n_drones=6, skyscrapers_factor=1),
    ],
    ids=["default-cli", "default-dataclass", "arena-6"],
)
def test_fused_step_matches_jnp_rollout(params):
    num_envs = 16
    rng = jax.random.PRNGKey(0)
    states = env_core.reset_batch(rng, params, num_envs)
    assert step_kernel.supports(params, num_envs)
    for t in range(25):
        rng, act_key, step_key = jax.random.split(rng, 3)
        actions = jax.random.randint(
            act_key, (num_envs, params.n_drones), 0, 5)
        keys = jax.random.split(step_key, num_envs)
        st_ref, rew_ref, done_ref = env_core.step_batch(
            keys, states, actions, params)
        st_k, rew_k, done_k = step_kernel.step_batch_fused(
            step_key, states, actions, params, interpret=True)
        _assert_states_equal(st_ref, st_k, f"step {t}")
        assert (np.asarray(rew_ref) == np.asarray(rew_k)).all()
        assert (np.asarray(done_ref) == np.asarray(done_k)).all()
        states = st_ref


@pytest.mark.slow
def test_fused_step_tight_board_overfull_tail():
    """Boards where respawn slots exceed vacant cells exercise the top_k
    -inf tail emulation (writes land on occupied cells, index-ascending)."""
    params = EnvParams(grid_size=5, n_drones=2, packets_factor=3,
                       dropzones_factor=2, stations_factor=2,
                       skyscrapers_factor=3)
    num_envs = 8
    rng = jax.random.PRNGKey(3)
    states = env_core.reset_batch(rng, params, num_envs)
    for t in range(40):
        rng, act_key, step_key = jax.random.split(rng, 3)
        actions = jax.random.randint(
            act_key, (num_envs, params.n_drones), 0, 5)
        keys = jax.random.split(step_key, num_envs)
        st_ref, rew_ref, _ = env_core.step_batch(keys, states, actions, params)
        st_k, rew_k, _ = step_kernel.step_batch_fused(
            step_key, states, actions, params, interpret=True)
        _assert_states_equal(st_ref, st_k, f"tight step {t}")
        assert (np.asarray(rew_ref) == np.asarray(rew_k)).all()
        states = st_ref
