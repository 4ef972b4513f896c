"""Fused Pallas raster: packed rows -> uint8 grayscale image, one kernel.

The XLA raster paths (ops/raster.py) materialize the unpacked cell grid and the
image separately; this kernel fuses bit-unpack, the 0/1 pixel-membership matmul
(MXU), the palette add, and the uint8 cast, reading each board row once and
writing each output pixel once. Pixel semantics are identical to
``convert_grayscale`` (tetris_env.py:76-114) — the same static geometry matrix
is used, and equality is asserted against the XLA paths (which are themselves
pixel-exact vs the reference) in tests/test_pallas_raster.py.

Perf note (clean v5e in-scan sweep, BENCH_LOCAL.md): this kernel reaches
13.7M env-steps/s (gray u8, B=4096) but the plain XLA matmul path reaches
17.3M — XLA fuses the unpack/matmul/palette/cast chain itself *and* pipelines
it with the engine step inside the scan, whereas a pallas_call is a fusion
barrier. Variants that avoid the in-kernel transpose via batch-major tiles and
x-major lane-concatenation measured slower still (7.5M; W-way concat relayouts
dominate). Kept as an opt-in (`raster_impl="pallas"`) and as the reference
fused-kernel implementation; `"auto"` picks the XLA matmul.

Input:  rows uint32[H, B] (batch-minor, piece burned in)
Output: img  uint8[B, size*size] (batch-major, reshape to [B, size, size])
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import EnvConfig, XSHIFT
from .raster import _matmul_operands, BACKGROUND_SHADE, PIECE_SHADE


def _build_kernel(h: int, w: int, size: int, bt: int):
    ncell = h * w
    npix = size * size

    def kernel(a_ref, base_ref, rows_ref, out_ref):
        rows = rows_ref[:]                                    # u32[H, bt]
        # unpack to [H*W, bt] bf16, cell index y*W + x (x fastest)
        planes = []
        for x in range(w):
            bit = (rows >> jnp.uint32(x + XSHIFT)) & jnp.uint32(1)
            planes.append(bit.astype(jnp.int32))
        cells = jnp.stack(planes, axis=1).reshape(ncell, bt)  # [H*W, bt]
        cells_t = cells.T.astype(jnp.bfloat16)                # [bt, H*W]
        hit = jnp.dot(cells_t, a_ref[:],
                      preferred_element_type=jnp.float32)     # [bt, npix]
        img = base_ref[:] + (PIECE_SHADE - BACKGROUND_SHADE) * hit
        # mosaic has no f32->u8 cast; go through i32 (values in [0, 190])
        out_ref[:] = img.astype(jnp.int32).astype(jnp.uint8)

    return kernel


@functools.lru_cache(maxsize=32)
def _build_call(h: int, w: int, size: int, batch: int, bt: int,
                interpret: bool):
    ncell = h * w
    npix = size * size
    grid = (batch // bt,)
    return pl.pallas_call(
        _build_kernel(h, w, size, bt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((ncell, npix), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),            # A matrix
            pl.BlockSpec((1, npix), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),            # base image
            pl.BlockSpec((h, bt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),            # rows tile
        ],
        out_specs=pl.BlockSpec((bt, npix), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, npix), jnp.uint8),
        interpret=interpret)


def rasterize_rows_pallas(cfg: EnvConfig, rows: jnp.ndarray, size: int = 84,
                          block_b: int = 256,
                          interpret: bool = None) -> jnp.ndarray:
    """uint32[H, B] packed rows -> uint8[B, size, size]. ``interpret`` defaults
    to True on CPU backends (tests) and False on TPU."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    h, w = cfg.height, cfg.width
    b = rows.shape[1]
    bt = next((t for t in (block_b, 256, 128) if b % t == 0), b)
    base, a = _matmul_operands(h, w, size)
    call = _build_call(h, w, size, b, bt, interpret)
    img = call(jnp.asarray(a, jnp.bfloat16),
               jnp.asarray(base, jnp.float32).reshape(1, -1),
               rows)
    return img.reshape(b, size, size)
