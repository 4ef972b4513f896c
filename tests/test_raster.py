"""Pixel-exact raster parity vs the reference ``convert_grayscale`` /
``convert_grayscale_rgb`` (tetris_env.py:76-122), across sizes and geometries."""

import numpy as np
import pytest
import jax.numpy as jnp

from reference_oracle import load_reference_module, reference_available
from gym_simpletetris_tpu.ops.raster import (
    rasterize, rasterize_matmul, rasterize_gather, grayscale_to_rgb,
    raster_geometry)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")

ALL_IMPLS = ("matmul", "gather", "bcast", "sep", "sepb")


def _random_boards(w, h, n, seed):
    rng = np.random.RandomState(seed)
    return (rng.rand(n, w, h) < 0.35).astype(float)


@pytest.mark.parametrize("w,h,size", [
    (10, 20, 84), (10, 20, 160), (10, 20, 512),
    (4, 5, 84), (16, 8, 84), (9, 20, 160), (7, 7, 84), (24, 6, 84),
])
def test_grayscale_pixel_parity(w, h, size):
    mod = load_reference_module()
    boards = _random_boards(w, h, 4, seed=size + w)
    # obs path: reference transposes internally, so image rows index board y;
    # our packed rows unpack to [B, H, W] == the post-transpose array.
    cells = jnp.asarray(boards.transpose(0, 2, 1))  # [B, H, W]
    got = {impl: np.asarray(rasterize(cells, h, w, size, impl=impl))
           for impl in ALL_IMPLS}
    for i in range(boards.shape[0]):
        want = mod.convert_grayscale(boards[i], size)
        for impl, g in got.items():
            np.testing.assert_array_equal(
                g[i], want, err_msg=f"impl={impl} ({w}x{h}@{size})")


def test_rgb_parity():
    mod = load_reference_module()
    boards = _random_boards(10, 20, 2, seed=0)
    cells = jnp.asarray(boards.transpose(0, 2, 1))
    got = np.asarray(grayscale_to_rgb(rasterize_matmul(cells, 20, 10, 84)))
    for i in range(2):
        want = mod.convert_grayscale_rgb(mod.convert_grayscale(boards[i], 84))
        np.testing.assert_array_equal(got[i], want)


def test_human_render_orientation_parity():
    """render('human') transposes the board *before* convert_grayscale
    (tetris_env.py:445-446), i.e. rasterizes the (W, H) array directly."""
    mod = load_reference_module()
    board = _random_boards(10, 20, 1, seed=3)[0]
    cells = jnp.asarray(board[None])                # [1, W, H]
    got = np.asarray(rasterize_matmul(cells, 10, 20, 512))[0]
    want = mod.convert_grayscale(np.transpose(board), 512)
    np.testing.assert_array_equal(got, want)


def test_geometry_survey_values():
    # SURVEY.md §2.4 [verified]: size 84 -> gap 1, block 3; 160 -> 2,5; 512 -> 6,19
    assert raster_geometry(20, 10, 84)[:2] == (1, 3)
    assert raster_geometry(20, 10, 160)[:2] == (2, 5)
    assert raster_geometry(20, 10, 512)[:2] == (6, 19)


def test_oversized_board_raises():
    with pytest.raises(ValueError):
        raster_geometry(60, 10, 84)
