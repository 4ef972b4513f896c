"""Determinism and sharded-checkpoint coverage."""

import jax
import jax.numpy as jnp
import numpy as np

from gym_simpletetris_tpu import EnvConfig, TetrisVectorEnv, make


def test_same_seed_same_trajectory():
    """Two vector envs with the same key produce identical trajectories."""
    cfg = EnvConfig(auto_reset=True)
    a, b = TetrisVectorEnv(cfg, 8), TetrisVectorEnv(cfg, 8)
    oa, sa = a.reset(jax.random.PRNGKey(9))
    ob, sb = b.reset(jax.random.PRNGKey(9))
    rng = np.random.RandomState(0)
    for t in range(40):
        act = jnp.asarray(rng.randint(0, 7, 8))
        oa, sa, ra, da, _ = a.step(sa, act)
        ob, sb, rb, db, _ = b.step(sb, act)
        np.testing.assert_array_equal(np.asarray(oa), np.asarray(ob))
        np.testing.assert_array_equal(np.asarray(ra), np.asarray(rb))


def test_different_seed_different_pieces():
    cfg = EnvConfig()
    a, b = TetrisVectorEnv(cfg, 64), TetrisVectorEnv(cfg, 64)
    _, sa = a.reset(jax.random.PRNGKey(1))
    _, sb = b.reset(jax.random.PRNGKey(2))
    assert not np.array_equal(np.asarray(sa.piece), np.asarray(sb.piece))


def test_gym_compat_seed_kwarg():
    e1 = make("SimpleTetris-v0", seed=5)
    e2 = make("SimpleTetris-v0", seed=5)
    e3 = make("SimpleTetris-v0", seed=6)
    e1.reset(); e2.reset(); e3.reset()
    p1, p2, p3 = (e._get_info()["current_piece"] for e in (e1, e2, e3))
    assert p1 == p2
    # different seeds *usually* differ; step a few times to be robust
    same = p1 == p3
    for _ in range(10):
        a1 = e1.step(2)[3]["current_piece"]
        a3 = e3.step(2)[3]["current_piece"]
        same = same and (a1 == a3)
    assert not same


def test_sharded_state_checkpoint_roundtrip(tmp_path):
    """Checkpoint/restore of a mesh-sharded env state (orbax handles
    shardings); resume must be bit-identical."""
    from gym_simpletetris_tpu.parallel.mesh import ShardedTetrisEnv, make_data_mesh
    from gym_simpletetris_tpu.utils.checkpoint import (
        restore_checkpoint, save_checkpoint)
    mesh = make_data_mesh()
    env = ShardedTetrisEnv(EnvConfig(auto_reset=True), 32, mesh)
    obs, state = env.reset(jax.random.PRNGKey(0))
    for t in range(10):
        obs, state, *_ = env.step(state, jnp.full((32,), 2, jnp.int32))
    path = save_checkpoint(str(tmp_path / "sharded"), state)
    restored = restore_checkpoint(path, target=state)
    o1, s1, *_ = env.step(state, jnp.zeros(32, jnp.int32))
    o2, s2, *_ = env.step(restored, jnp.zeros(32, jnp.int32))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(s1.rows), np.asarray(s2.rows))
