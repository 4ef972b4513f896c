"""Tests for the replay buffer, Q-networks, and the on-device DQN loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_simpletetris_tpu import EnvConfig
from gym_simpletetris_tpu.models.dqn import NatureDQN, RamDQN, build_q_network
from gym_simpletetris_tpu.train.replay import (
    replay_init, replay_insert, replay_sample)
from gym_simpletetris_tpu.train.dqn import DQNConfig, make_train


def test_replay_ring_semantics():
    rs = replay_init(16, (4,), insert_width=4)
    for i in range(6):  # wraps after 4 inserts
        obs = jnp.full((4, 4), i, jnp.uint8)
        rs = replay_insert(rs, obs, obs + 100, jnp.full((4,), i, jnp.int32),
                           jnp.full((4,), float(i)), jnp.zeros((4,), bool), gamma=0.99)
    assert int(rs.filled) == 16
    assert int(rs.ptr) == 6 % 4   # slot-column pointer
    # ring: slots hold the last 4 inserts (2,3,4,5), oldest overwritten
    vals = set(np.unique(np.asarray(rs.obs)).tolist())
    assert vals == {2, 3, 4, 5}
    batch = replay_sample(rs, jax.random.PRNGKey(0), 32)
    assert batch["obs"].shape == (32, 4)
    assert np.all(np.asarray(batch["next_obs"]) - np.asarray(batch["obs"]) == 100)


def test_replay_capacity_validation():
    with pytest.raises(ValueError):
        replay_init(10, (4,), insert_width=3)


def test_networks_shapes():
    k = jax.random.PRNGKey(0)
    net = NatureDQN()
    p = net.init(k, jnp.zeros((2, 84, 84, 1)))
    q = net.apply(p, jnp.zeros((5, 84, 84, 1)))
    assert q.shape == (5, 7) and q.dtype == jnp.float32

    net = RamDQN(dueling=True)
    p = net.init(k, jnp.zeros((2, 10, 20)))
    q = net.apply(p, jnp.zeros((3, 10, 20)))
    assert q.shape == (3, 7)

    assert isinstance(build_q_network("ram", (10, 20)), RamDQN)
    assert isinstance(build_q_network("grayscale", (84, 84)), NatureDQN)


def test_dqn_train_loop_runs_and_learns_something():
    cfg = DQNConfig(
        env=EnvConfig(obs_type="ram", auto_reset=True, reward_step=True,
                      width=6, height=8),
        num_envs=16, buffer_capacity=1024, learn_batch=64,
        learn_starts=64, eps_decay_steps=200, target_update_period=10)
    init_fn, step_fn, chunk_fn, _ = make_train(cfg)
    state = init_fn(jax.random.PRNGKey(0))
    state, metrics = jax.jit(lambda s: chunk_fn(s, 20))(state)
    assert int(state.step) == 20
    assert int(state.replay.filled) == 20 * 16
    assert int(state.learn_steps) > 0          # learning kicked in
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["epsilon"]) < 1.0     # annealing moved
    # params actually changed
    p0 = init_fn(jax.random.PRNGKey(0)).params
    diff = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()), p0, state.params))
    assert diff > 0


def test_dqn_requires_auto_reset():
    with pytest.raises(ValueError):
        make_train(DQNConfig(env=EnvConfig(auto_reset=False), num_envs=4,
                             buffer_capacity=64))


def test_dqn_sharded_train_step():
    """DQN train step with env batch + replay sharded over the 8-device mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from gym_simpletetris_tpu.parallel.mesh import make_data_mesh, DATA_AXIS

    mesh = make_data_mesh()
    cfg = DQNConfig(
        env=EnvConfig(obs_type="ram", auto_reset=True, width=6, height=8),
        num_envs=16, buffer_capacity=256, learn_batch=32, learn_starts=32)
    init_fn, step_fn, chunk_fn, _ = make_train(cfg)
    state = init_fn(jax.random.PRNGKey(1))

    shard_b0 = NamedSharding(mesh, P(DATA_AXIS))
    state = state.replace(
        obs=jax.device_put(state.obs, shard_b0),
        replay=jax.tree.map(
            lambda x: jax.device_put(
                x, shard_b0 if getattr(x, "ndim", 0) >= 1 and
                x.shape and x.shape[0] == cfg.buffer_capacity else None),
            state.replay))
    state, metrics = jax.jit(lambda s: chunk_fn(s, 4))(state)
    assert int(state.step) == 4
    assert np.isfinite(float(metrics["mean_q"]))


def test_dqn_frame_stack():
    cfg = DQNConfig(
        env=EnvConfig(obs_type="grayscale", auto_reset=True, width=6, height=8),
        num_envs=4, buffer_capacity=64, learn_batch=8, learn_starts=8,
        frame_stack=4)
    init_fn, step_fn, chunk_fn, net = make_train(cfg)
    state = init_fn(jax.random.PRNGKey(0))
    assert state.obs.shape == (4, 84, 84, 4)
    # reset: all stacked frames identical
    assert float(jnp.abs(state.obs[..., 0] - state.obs[..., 3]).max()) == 0
    prev_newest = state.obs[..., 3]
    state, metrics = jax.jit(lambda s: chunk_fn(s, 3))(state)
    assert state.obs.shape == (4, 84, 84, 4)
    assert state.replay.obs.shape == (16, 4, 84 * 84 * 4)  # flattened
    assert np.isfinite(float(metrics["mean_q"]))


def test_learn_every_update_ratio():
    """learn_every=4: 16 actor steps -> 4 learner updates; replay advanced
    on every actor step; a chunk length not divisible by learn_every is
    rejected. Trajectories (env interactions) must be unaffected by when the
    learner runs before learning starts."""
    def mk(le, learn_starts=32):
        cfg = DQNConfig(
            env=EnvConfig(obs_type="ram", auto_reset=True, width=6, height=8),
            num_envs=8, buffer_capacity=256, learn_batch=16,
            learn_starts=learn_starts, learn_every=le)
        return make_train(cfg)

    init_fn, _, chunk_fn, _ = mk(4)
    state = init_fn(jax.random.PRNGKey(0))
    state, metrics = jax.jit(lambda s: chunk_fn(s, 16))(state)
    assert int(state.step) == 16
    # 4 learner attempts; the first runs at actor step 4 when filled = 4*8
    # already meets learn_starts=32, so all 4 learn
    assert int(state.learn_steps) == 4
    assert int(state.replay.filled_slots) == 16        # insert every actor step
    with pytest.raises(ValueError):
        chunk_fn(state, 6)   # 6 % 4 != 0

    # learner gated off entirely: env trajectories identical for le=1 vs le=4
    init1, _, chunk1, _ = mk(1, learn_starts=1 << 30)
    init4, _, chunk4, _ = mk(4, learn_starts=1 << 30)
    s1 = init1(jax.random.PRNGKey(3))
    s4 = init4(jax.random.PRNGKey(3))
    s1, _ = jax.jit(lambda s: chunk1(s, 8))(s1)
    s4, _ = jax.jit(lambda s: chunk4(s, 8))(s4)
    np.testing.assert_array_equal(np.asarray(s1.env_state.rows),
                                  np.asarray(s4.env_state.rows))
    np.testing.assert_array_equal(np.asarray(s1.replay.action),
                                  np.asarray(s4.replay.action))


def test_learn_every_validation():
    with pytest.raises(ValueError):
        DQNConfig(learn_every=0)


def test_learn_every_reduces_compiled_flops():
    """CPU perf canary: actor-only steps must not carry the gradient graph.

    XLA's cost_analysis counts a scan body ONCE (not times the trip count),
    so compare per-body: learn_every=4's body (3 actor-only + 1 full step)
    must cost barely more than learn_every=1's body (1 full step) — i.e.,
    3 actor steps together well under one learner's worth of FLOPs. If the
    actor steps ever pick up the grad graph, the le=4 body jumps toward 4x."""
    from functools import partial

    def body_flops(le):
        cfg = DQNConfig(
            env=EnvConfig(obs_type="ram", auto_reset=True, width=6, height=8),
            num_envs=8, buffer_capacity=256, learn_batch=64,
            learn_starts=64, learn_every=le)
        init_fn, _, chunk_fn, _ = make_train(cfg)
        state = init_fn(jax.random.PRNGKey(0))
        comp = jax.jit(partial(chunk_fn, n=8)).lower(state).compile()
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        return float(ca["flops"])

    f1, f4 = body_flops(1), body_flops(4)
    assert f4 < 1.5 * f1, (f1, f4)   # measured ~1.07x; grad graph would be ~4x
