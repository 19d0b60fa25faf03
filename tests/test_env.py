"""Environment unit tests: hand-constructed states → one step → exact asserts.

Follows the reference test philosophy (reference: tests/jax_tests/test_env.py):
build a fully known EnvState, apply scripted actions, assert positions,
charges, rewards, dones and ground contents exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dronerl_tpu.constants import Action, Object
from dronerl_tpu.env import core
from dronerl_tpu.env.types import EnvParams, EnvState


def make_state(params, drones, ground_objects=(), carrying=None, charge=None):
    """Build an exact state.

    drones: list of (x, y). ground_objects: list of (y, x, Object).
    """
    g = params.grid_size
    ground = jnp.zeros((g, g), dtype=jnp.int8)
    for y, x, obj in ground_objects:
        ground = ground.at[y, x].set(obj.value)
    n = len(drones)
    assert n == params.n_drones
    air_x = jnp.array([d[0] for d in drones], dtype=jnp.int32)
    air_y = jnp.array([d[1] for d in drones], dtype=jnp.int32)
    if carrying is None:
        carrying = [False] * n
    if charge is None:
        charge = [100.0] * n
    return EnvState(
        ground=ground,
        air_x=air_x,
        air_y=air_y,
        carrying_package=jnp.array(carrying, dtype=jnp.bool_),
        charge=jnp.array(charge, dtype=jnp.float32),
    )


KEY = jax.random.PRNGKey(42)


class TestMovement:
    @pytest.mark.parametrize(
        "action,expected",
        [
            (Action.LEFT, (3, 4)),
            (Action.RIGHT, (5, 4)),
            (Action.UP, (4, 3)),
            (Action.DOWN, (4, 5)),
            (Action.STAY, (4, 4)),
        ],
    )
    def test_single_moves(self, action, expected):
        params = EnvParams(grid_size=9, n_drones=1, skyscrapers_factor=0,
                           packets_factor=0, dropzones_factor=0, stations_factor=0)
        state = make_state(params, [(4, 4)])
        new_state, rewards, dones = core.step(
            KEY, state, jnp.array([action.value]), params)
        assert (int(new_state.air_x[0]), int(new_state.air_y[0])) == expected
        assert not bool(dones[0])
        assert float(rewards[0]) == 0.0
        assert float(new_state.charge[0]) == 90.0  # discharged

    def test_off_board_crash(self):
        params = EnvParams(grid_size=5, n_drones=1, skyscrapers_factor=0,
                           packets_factor=0, dropzones_factor=0, stations_factor=0)
        state = make_state(params, [(0, 0)])
        new_state, rewards, dones = core.step(
            KEY, state, jnp.array([Action.LEFT.value]), params)
        assert bool(dones[0])
        assert float(rewards[0]) == params.crash_reward
        assert float(new_state.charge[0]) == 100.0  # respawned fully charged
        # respawned somewhere on the board
        assert 0 <= int(new_state.air_x[0]) < 5
        assert 0 <= int(new_state.air_y[0]) < 5


class TestCrashes:
    def test_skyscraper_crash(self):
        params = EnvParams(grid_size=5, n_drones=1, skyscrapers_factor=1,
                           packets_factor=0, dropzones_factor=0, stations_factor=0)
        state = make_state(params, [(1, 1)],
                           ground_objects=[(1, 2, Object.SKYSCRAPER)])
        _, rewards, dones = core.step(
            KEY, state, jnp.array([Action.RIGHT.value]), params)
        assert bool(dones[0])
        assert float(rewards[0]) == -1.0

    def test_head_on_same_cell_collision(self):
        params = EnvParams(grid_size=5, n_drones=2, skyscrapers_factor=0,
                           packets_factor=0, dropzones_factor=0, stations_factor=0)
        # both move to (2, 2)
        state = make_state(params, [(1, 2), (3, 2)])
        _, rewards, dones = core.step(
            KEY, state,
            jnp.array([Action.RIGHT.value, Action.LEFT.value]), params)
        assert bool(dones[0]) and bool(dones[1])
        np.testing.assert_array_equal(np.asarray(rewards), [-1.0, -1.0])

    def test_pass_through_no_collision(self):
        # Same-destination-cell semantics: swapping positions is legal.
        params = EnvParams(grid_size=5, n_drones=2, skyscrapers_factor=0,
                           packets_factor=0, dropzones_factor=0, stations_factor=0)
        state = make_state(params, [(1, 2), (2, 2)])
        new_state, _, dones = core.step(
            KEY, state,
            jnp.array([Action.RIGHT.value, Action.LEFT.value]), params)
        assert not bool(dones[0]) and not bool(dones[1])
        assert int(new_state.air_x[0]) == 2 and int(new_state.air_x[1]) == 1


class TestCharge:
    def test_discharge_death_and_respawn(self):
        params = EnvParams(grid_size=5, n_drones=1, skyscrapers_factor=0,
                           packets_factor=0, dropzones_factor=0, stations_factor=0)
        state = make_state(params, [(2, 2)], charge=[10.0])
        new_state, rewards, dones = core.step(
            KEY, state, jnp.array([Action.STAY.value]), params)
        assert bool(dones[0])
        assert float(rewards[0]) == -1.0
        assert float(new_state.charge[0]) == 100.0

    def test_charging_at_station(self):
        params = EnvParams(grid_size=5, n_drones=1, skyscrapers_factor=0,
                           packets_factor=0, dropzones_factor=0, stations_factor=1)
        state = make_state(params, [(2, 2)],
                           ground_objects=[(2, 2, Object.STATION)], charge=[50.0])
        new_state, rewards, dones = core.step(
            KEY, state, jnp.array([Action.STAY.value]), params)
        assert not bool(dones[0])
        assert float(new_state.charge[0]) == 70.0
        assert float(rewards[0]) == pytest.approx(params.charge_reward)

    def test_charge_caps_at_100(self):
        params = EnvParams(grid_size=5, n_drones=1, skyscrapers_factor=0,
                           packets_factor=0, dropzones_factor=0, stations_factor=1)
        state = make_state(params, [(2, 2)],
                           ground_objects=[(2, 2, Object.STATION)], charge=[95.0])
        new_state, _, _ = core.step(
            KEY, state, jnp.array([Action.STAY.value]), params)
        assert float(new_state.charge[0]) == 100.0


class TestPackets:
    def test_pickup_then_delivery(self):
        params = EnvParams(grid_size=6, n_drones=1, skyscrapers_factor=0,
                           packets_factor=1, dropzones_factor=1, stations_factor=0)
        state = make_state(
            params, [(1, 1)],
            ground_objects=[(1, 2, Object.PACKET), (1, 3, Object.DROPZONE)])
        # move right onto the packet
        state, rewards, _ = core.step(
            KEY, state, jnp.array([Action.RIGHT.value]), params)
        assert bool(state.carrying_package[0])
        assert float(rewards[0]) == params.pickup_reward
        assert int(state.ground[1, 2]) == 0  # packet gone from the ground
        # move right onto the dropzone
        state, rewards, _ = core.step(
            jax.random.PRNGKey(7), state, jnp.array([Action.RIGHT.value]), params)
        assert not bool(state.carrying_package[0])
        assert float(rewards[0]) == params.delivery_reward
        # dropzone consumed; a new packet and a new dropzone respawned
        ground = np.asarray(state.ground)
        assert (ground == Object.PACKET.value).sum() == 1
        assert (ground == Object.DROPZONE.value).sum() == 1

    def test_no_pickup_when_already_carrying(self):
        params = EnvParams(grid_size=6, n_drones=1, skyscrapers_factor=0,
                           packets_factor=1, dropzones_factor=0, stations_factor=0)
        state = make_state(params, [(1, 1)],
                           ground_objects=[(1, 2, Object.PACKET)],
                           carrying=[True])
        state, _, _ = core.step(
            KEY, state, jnp.array([Action.RIGHT.value]), params)
        assert bool(state.carrying_package[0])
        assert int(state.ground[1, 2]) == Object.PACKET.value  # still there

    def test_dead_drone_drops_package_and_it_respawns(self):
        params = EnvParams(grid_size=6, n_drones=1, skyscrapers_factor=0,
                           packets_factor=1, dropzones_factor=0, stations_factor=0)
        state = make_state(params, [(0, 0)], carrying=[True])
        state, _, dones = core.step(
            KEY, state, jnp.array([Action.LEFT.value]), params)
        assert bool(dones[0])
        ground = np.asarray(state.ground)
        total_packets = (ground == Object.PACKET.value).sum() + int(
            state.carrying_package[0])
        assert total_packets == 1  # conservation: dropped packet respawned


class TestReset:
    def test_reset_invariants(self):
        params = EnvParams()
        state = core.reset(jax.random.PRNGKey(0), params)
        ground = np.asarray(state.ground)
        n_carried = int(np.asarray(state.carrying_package).sum())
        assert (ground == Object.PACKET.value).sum() + n_carried == params.num_packets
        assert (ground == Object.DROPZONE.value).sum() == params.num_dropzones
        assert (ground == Object.STATION.value).sum() == params.num_stations
        assert (ground == Object.SKYSCRAPER.value).sum() == params.num_skyscrapers
        # all drones on-board, never on a skyscraper, fully charged
        xs, ys = np.asarray(state.air_x), np.asarray(state.air_y)
        assert ((0 <= xs) & (xs < params.grid_size)).all()
        assert ((0 <= ys) & (ys < params.grid_size)).all()
        assert (ground[ys, xs] != Object.SKYSCRAPER.value).all()
        np.testing.assert_array_equal(np.asarray(state.charge), 100.0)
        # distinct cells
        cells = set(zip(xs.tolist(), ys.tolist()))
        assert len(cells) == params.n_drones

    def test_capacity_validation(self):
        params = EnvParams(grid_size=3, n_drones=4)
        with pytest.raises(ValueError):
            core.reset(jax.random.PRNGKey(0), params)


class TestObserve:
    @pytest.mark.parametrize("radius", [2, 3, 4])
    def test_window_shape(self, radius):
        params = EnvParams(window_radius=radius)
        state = core.reset(jax.random.PRNGKey(0), params)
        obs = core.observe(state, params)
        w = 2 * radius + 1
        assert obs.shape == (params.n_drones, w, w, 6)
        assert obs.dtype == jnp.float32

    def test_window_contents(self):
        params = EnvParams(grid_size=7, n_drones=2, skyscrapers_factor=0,
                           packets_factor=1, dropzones_factor=1,
                           stations_factor=1, window_radius=2)
        state = make_state(
            params, [(3, 3), (5, 3)],
            ground_objects=[
                (3, 4, Object.PACKET),   # right of drone 0
                (2, 3, Object.DROPZONE),  # above drone 0
                (4, 3, Object.STATION),   # below drone 0
                (3, 2, Object.PACKET),    # left of drone 0 (2nd packet slot)
                (0, 0, Object.DROPZONE),
                (0, 1, Object.STATION),
            ],
            carrying=[True, False], charge=[80.0, 100.0])
        obs = np.asarray(core.observe(state, params))
        c = params.window_radius  # center index
        # drone 0: own cell has drone, carried packet, charge 0.8
        assert obs[0, c, c, 0] == 1.0
        assert obs[0, c, c, 1] == 1.0  # carrying marker
        assert obs[0, c, c, 4] == pytest.approx(0.8)
        # neighbours as placed (channels: 1 packet, 2 dropzone, 3 station)
        assert obs[0, c, c + 1, 1] == 1.0
        assert obs[0, c - 1, c, 2] == 1.0
        assert obs[0, c + 1, c, 3] == 1.0
        assert obs[0, c, c - 1, 1] == 1.0
        # drone 1 at (x=5, y=3): drone 0 visible two cells to the left
        assert obs[1, c, c - 2, 0] == 1.0
        # wall padding: drone 1 is 1 cell from the right edge; the
        # rightmost window column is off-board → wall channel
        assert (obs[1, :, c + 2, 5] == 1.0).all()

    def test_zero_charge_drone_still_visible(self):
        # The +1 charge-grid offset keeps a 0-charge drone in channel 0.
        params = EnvParams(grid_size=5, n_drones=1, skyscrapers_factor=0,
                           packets_factor=0, dropzones_factor=0,
                           stations_factor=0, window_radius=1)
        state = make_state(params, [(2, 2)], charge=[0.0])
        obs = np.asarray(core.observe(state, params))
        assert obs[0, 1, 1, 0] == 1.0
        assert obs[0, 1, 1, 4] == 0.0

    def test_global_view(self):
        params = EnvParams(grid_size=6, n_drones=2, wrapper="global",
                           skyscrapers_factor=1, packets_factor=1,
                           dropzones_factor=1, stations_factor=1)
        state = core.reset(jax.random.PRNGKey(3), params)
        obs = np.asarray(core.observe(state, params))
        assert obs.shape == (2, 6, 6, 6)
        ys, xs = np.asarray(state.air_y), np.asarray(state.air_x)
        assert (obs[0, ys, xs, 0] == 1.0).all()
        # both drones see the same global grid
        np.testing.assert_array_equal(obs[0], obs[1])


class TestBatched:
    def test_batched_rollout_matches_single(self):
        params = EnvParams()
        num_envs = 4
        root = jax.random.PRNGKey(9)
        states = core.reset_batch(root, params, num_envs)
        step_keys = jax.random.split(jax.random.PRNGKey(11), num_envs)
        actions = jax.random.randint(
            jax.random.PRNGKey(12), (num_envs, params.n_drones), 0, 5)
        batched, rew_b, done_b = core.step_batch(step_keys, states, actions, params)
        for e in range(num_envs):
            single = jax.tree.map(lambda a: a[e], states)
            s, r, d = core.step(step_keys[e], single, actions[e], params)
            for got, want in zip(jax.tree.leaves(jax.tree.map(lambda a: a[e], batched)),
                                 jax.tree.leaves(s)):
                np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
            np.testing.assert_array_equal(np.asarray(rew_b[e]), np.asarray(r))
            np.testing.assert_array_equal(np.asarray(done_b[e]), np.asarray(d))

    def test_rollout_runs(self):
        params = EnvParams()
        state = core.reset(jax.random.PRNGKey(0), params)

        def policy(key, st):
            return jax.random.randint(key, (params.n_drones,), 0, 5)

        final, rewards, dones = core.rollout(
            jax.random.PRNGKey(1), state, params, 20, policy)
        assert rewards.shape == (20, params.n_drones)
        assert dones.shape == (20, params.n_drones)
