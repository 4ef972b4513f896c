"""Pallas fused raster == XLA raster (pixel-exact), interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_simpletetris_tpu import EnvConfig
from gym_simpletetris_tpu.ops.bitops import pack_board, unpack_cells
from gym_simpletetris_tpu.ops.pallas_raster import rasterize_rows_pallas
from gym_simpletetris_tpu.ops.raster import rasterize_gather


@pytest.mark.parametrize("w,h", [(10, 20), (4, 5), (16, 8)])
def test_pallas_raster_matches_xla(w, h):
    cfg = EnvConfig(width=w, height=h)
    rng = np.random.RandomState(w * h)
    boards = (rng.rand(4, w, h) < 0.35).astype(float)
    rows = jnp.asarray(pack_board(cfg, boards))              # [H, B]
    got = np.asarray(rasterize_rows_pallas(cfg, rows, 84, interpret=True))
    cells = jnp.asarray(boards.transpose(0, 2, 1)).astype(jnp.uint8)  # [B,H,W]
    want = np.asarray(rasterize_gather(cells, h, w, 84))
    np.testing.assert_array_equal(got, want)


def test_pallas_raster_via_env_api():
    env_cfg = EnvConfig(obs_type="grayscale", raster_impl="pallas",
                        auto_reset=True)
    from gym_simpletetris_tpu import TetrisVectorEnv
    envP = TetrisVectorEnv(env_cfg, 4)
    envG = TetrisVectorEnv(env_cfg.replace(raster_impl="gather"), 4)
    obsP, sP = envP.reset(jax.random.PRNGKey(0))
    obsG, sG = envG.reset(jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(obsP), np.asarray(obsG))
    for t in range(10):
        a = jnp.full((4,), t % 7, jnp.int32)
        obsP, sP, *_ = envP.step(sP, a)
        obsG, sG, *_ = envG.step(sG, a)
        np.testing.assert_array_equal(np.asarray(obsP), np.asarray(obsG))


@pytest.mark.parametrize("w,h", [(10, 20), (6, 8), (40, 30)])
def test_raster_accumulate_matches_xla(w, h):
    """Fused raster+accumulate (reference kernel, demoted — see
    BENCH_LOCAL.md round 3): acc' bitwise == acc + storage obs, incl. uint8
    wraparound and multi-word wide boards."""
    from gym_simpletetris_tpu.api.env import build_observation_storage
    from gym_simpletetris_tpu.ops.pallas_raster import raster_accumulate
    from gym_simpletetris_tpu.core import engine as E
    from gym_simpletetris_tpu import TetrisVectorEnv
    cfg = EnvConfig(obs_type="grayscale", auto_reset=True, width=w, height=h)
    env = TetrisVectorEnv(cfg, batch_size=8)
    obs, state = env.reset(jax.random.PRNGKey(0))
    acc = jnp.asarray(np.random.RandomState(1).randint(
        0, 256, (8, 84, 84), dtype=np.uint8))   # random start: exercises wrap
    for t in range(5):
        a = jnp.asarray(np.random.RandomState(t).randint(0, 7, 8))
        out = E.engine_step(cfg, state, a)
        state, emitted = out.state, out.emitted_rows
        want = acc + build_observation_storage(cfg, emitted)
        got = raster_accumulate(cfg, emitted, acc, interpret=True)
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
        acc = got


def test_fused_acc_rollout_matches_plain():
    from gym_simpletetris_tpu import TetrisVectorEnv
    cfg = EnvConfig(obs_type="grayscale", auto_reset=True)
    env = TetrisVectorEnv(cfg, batch_size=8)
    obs, state = env.reset(jax.random.PRNGKey(0))
    acts = jax.random.randint(jax.random.PRNGKey(1), (12, 8), 0, 7,
                              dtype=jnp.int32)
    f1, a1, r1, d1 = env.rollout(state, acts)
    f2, a2, r2, d2 = env.rollout(state, acts, fused_acc=True)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    with pytest.raises(ValueError):
        env.rollout(state, acts, acc_mode="delivered", fused_acc=True)
