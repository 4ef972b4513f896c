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
