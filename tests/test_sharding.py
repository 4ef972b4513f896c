"""Multi-device tests on the virtual 8-device CPU mesh (conftest forces
--xla_force_host_platform_device_count=8; SURVEY.md §4.4): sharded stepping
equals unsharded stepping, state placement is correct, shard_map collectives
work, and per-shard RNG decorrelates."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from gym_simpletetris_tpu import EnvConfig
from gym_simpletetris_tpu.core.state import init_state
from gym_simpletetris_tpu.parallel.mesh import (
    DATA_AXIS, ShardedTetrisEnv, global_metrics, make_data_mesh,
    shard_map_step, state_sharding)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"
    return make_data_mesh()


def test_mesh_has_8_devices(mesh):
    assert mesh.size == 8 and mesh.axis_names == (DATA_AXIS,)


def test_sharded_env_state_placement(mesh):
    env = ShardedTetrisEnv(EnvConfig(auto_reset=True), 64, mesh)
    obs, state = env.reset(jax.random.PRNGKey(0))
    # rows [H, B]: batch axis sharded 8-ways
    sh = state.rows.sharding
    assert sh.is_equivalent_to(
        NamedSharding(mesh, P(None, DATA_AXIS)), state.rows.ndim)
    assert state.time.sharding.is_equivalent_to(
        NamedSharding(mesh, P(DATA_AXIS)), 1)
    assert obs.shape == (64, 10, 20)


def test_sharded_step_matches_unsharded(mesh):
    """Bitwise: stepping a sharded batch == stepping the same batch unsharded."""
    from gym_simpletetris_tpu import TetrisVectorEnv
    cfg = EnvConfig(auto_reset=True)
    key = jax.random.PRNGKey(1)
    envS = ShardedTetrisEnv(cfg, 32, mesh)
    envU = TetrisVectorEnv(cfg, 32)
    obsS, sS = envS.reset(key)
    obsU, sU = envU.reset(key)
    np.testing.assert_array_equal(np.asarray(obsS), np.asarray(obsU))
    rng = np.random.RandomState(0)
    for t in range(40):
        a = jnp.asarray(rng.randint(0, 7, 32))
        obsS, sS, rS, dS, _ = envS.step(sS, a)
        obsU, sU, rU, dU, _ = envU.step(sU, a)
        np.testing.assert_array_equal(np.asarray(obsS), np.asarray(obsU),
                                      err_msg=f"t={t}")
        np.testing.assert_array_equal(np.asarray(rS), np.asarray(rU))
        np.testing.assert_array_equal(np.asarray(dS), np.asarray(dU))
    np.testing.assert_array_equal(np.asarray(sS.rows), np.asarray(sU.rows))


def test_sharded_rollout(mesh):
    env = ShardedTetrisEnv(EnvConfig(auto_reset=True), 64, mesh)
    obs, state = env.reset(jax.random.PRNGKey(2))
    actions = jax.random.randint(jax.random.PRNGKey(3), (30, 64), 0, 7)
    final, acc, rew, done = env.rollout(state, actions)
    assert rew.shape == (30, 64)
    assert int(final.time.min()) >= 0
    m = global_metrics(final, mesh)
    assert m["env_steps"] >= 0


def test_shard_map_step_runs_and_decorrelates(mesh):
    """shard_map path: collective done-count works; per-shard key folding makes
    piece draws differ across shards (identical boards, same actions)."""
    cfg = EnvConfig(auto_reset=True, width=4, height=5)  # tiny: deaths quickly
    B = 32
    state = init_state(cfg, B, jax.random.PRNGKey(4))
    from gym_simpletetris_tpu.core import engine as E
    state, _ = E.engine_clear(cfg, state)
    sharding = state_sharding(mesh)
    state = jax.tree.map(
        lambda x, s: jax.device_put(x, s), state, sharding)
    step = jax.jit(shard_map_step(cfg, mesh))
    pieces = []
    for t in range(30):
        a = jnp.full((B,), 2, jnp.int32)  # hard drop spam -> many spawns
        obs, state, rew, done, finished = step(state, a)
        pieces.append(np.asarray(state.piece))
    # after many spawns, shards must not have identical piece streams:
    # compare env 0 (shard 0) vs env 4 (shard 1) histories
    h = np.stack(pieces)             # [T, B]
    per_shard = h[:, :: B // 8]      # first env of each shard
    assert not all(
        np.array_equal(per_shard[:, 0], per_shard[:, i]) for i in range(1, 8))


def test_init_distributed_noop():
    from gym_simpletetris_tpu.parallel.mesh import init_distributed
    init_distributed()  # single host, no coordinator: must be a no-op


def test_collective_bench_runs(mesh):
    from gym_simpletetris_tpu.parallel.collective_bench import bench_collectives
    out = bench_collectives(mesh, mb=0.5, iters=2)
    assert out["devices"] == 8
    ops = {r["op"] for r in out["results"]}
    assert ops == {"psum", "all_gather_sum", "ppermute"}
    for r in out["results"]:
        assert r["seconds"] > 0


def test_make_train_mesh_aware_matches_unsharded(mesh):
    """make_train(cfg, mesh=...) — the public distributed-training API — must
    (a) construct the DQNState born sharded per the path-assigned rules
    (params TP'd on the model axis, replay/env batch on data), and
    (b) produce the same training trajectory as the unsharded make_train
    (bitwise for integer env state; float params to reduction-order tol)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from gym_simpletetris_tpu.train.dqn import DQNConfig, make_train

    devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh2 = Mesh(devs, ("data", "model"))
    cfg = DQNConfig(
        env=EnvConfig(obs_type="ram", auto_reset=True, reward_step=True,
                      width=6, height=8),
        num_envs=16, buffer_capacity=256, learn_batch=16, learn_starts=32,
        target_update_period=5)

    init_u, step_u, _, _ = make_train(cfg)
    init_s, step_s, chunk_s, _ = make_train(cfg, mesh=mesh2)

    su = init_u(jax.random.PRNGKey(7))
    ss = init_s(jax.random.PRNGKey(7))

    # born sharded: check a few load-bearing leaves
    def spec_of(x):
        return x.sharding.spec
    assert spec_of(ss.replay.obs) == P(None, "data")
    assert spec_of(ss.obs) == P("data")
    assert spec_of(ss.env_state.rows) == P(None, "data")
    # the dense kernels are TP'd over model (last dim divides 2)
    kernels = [l for p, l in jax.tree_util.tree_leaves_with_path(ss.params)
               if "kernel" in jax.tree_util.keystr(p)]
    assert any(l.sharding.spec == P(*((None,) * (l.ndim - 1) + ("model",)))
               for l in kernels)
    # Adam mirrors in opt_state carry the same TP rule
    opt_kernels = [l for p, l in
                   jax.tree_util.tree_leaves_with_path(ss.opt_state)
                   if "kernel" in jax.tree_util.keystr(p)
                   and getattr(l, "ndim", 0) >= 2]
    assert any(l.sharding.spec == P(*((None,) * (l.ndim - 1) + ("model",)))
               for l in opt_kernels)

    # same trajectory: run 40 steps on both
    step_uj = jax.jit(step_u)
    for _ in range(40):
        su, mu = step_uj(su)
        ss, ms = step_s(ss)
    np.testing.assert_array_equal(np.asarray(su.env_state.rows),
                                  np.asarray(ss.env_state.rows))
    np.testing.assert_array_equal(np.asarray(su.replay.done),
                                  np.asarray(ss.replay.done))
    assert int(su.learn_steps) == int(ss.learn_steps) > 0
    for (pu, lu), (ps, ls) in zip(
            jax.tree_util.tree_leaves_with_path(su.params),
            jax.tree_util.tree_leaves_with_path(ss.params)):
        np.testing.assert_allclose(np.asarray(lu), np.asarray(ls),
                                   rtol=2e-4, atol=2e-6,
                                   err_msg=jax.tree_util.keystr(pu))
    # chunked variant also runs sharded
    ss, m = chunk_s(ss, 4)
    assert np.isfinite(float(np.asarray(m["loss"])))


def test_make_ppo_mesh_aware_matches_unsharded(mesh):
    """make_ppo(cfg, mesh=...) — same path-assigned sharding family as DQN:
    state born sharded, identical training trajectory vs unsharded."""
    from jax.sharding import Mesh, PartitionSpec as P
    from gym_simpletetris_tpu.train.ppo import PPOConfig, make_ppo

    devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh2 = Mesh(devs, ("data", "model"))
    cfg = PPOConfig(
        env=EnvConfig(obs_type="ram", auto_reset=True, reward_step=True,
                      width=6, height=8),
        num_envs=16, rollout_len=8, num_minibatches=2, epochs=1)

    init_u, upd_u, _ = make_ppo(cfg)
    init_s, upd_s, _ = make_ppo(cfg, mesh=mesh2)
    su = init_u(jax.random.PRNGKey(9))
    ss = init_s(jax.random.PRNGKey(9))
    assert ss.obs.sharding.spec == P("data")
    assert ss.env_state.rows.sharding.spec == P(None, "data")
    kernels = [l for p, l in jax.tree_util.tree_leaves_with_path(ss.params)
               if "kernel" in jax.tree_util.keystr(p)]
    assert any(l.sharding.spec == P(*((None,) * (l.ndim - 1) + ("model",)))
               for l in kernels)

    upd_uj = jax.jit(upd_u)
    for _ in range(5):
        su, mu = upd_uj(su)
        ss, ms = upd_s(ss)
    assert int(su.update) == int(ss.update) == 5
    np.testing.assert_array_equal(np.asarray(su.env_state.rows),
                                  np.asarray(ss.env_state.rows))
    for (pu, lu), (_, ls) in zip(
            jax.tree_util.tree_leaves_with_path(su.params),
            jax.tree_util.tree_leaves_with_path(ss.params)):
        np.testing.assert_allclose(np.asarray(lu), np.asarray(ls),
                                   rtol=2e-4, atol=2e-6,
                                   err_msg=jax.tree_util.keystr(pu))
