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


# ---------------------------------------------------------------------------
# Fused raster + accumulate: acc' = acc + rasterize(cells), one kernel.
#
# STATUS (round 3): **reference implementation, measured SLOWER than the XLA
# sep path** — 8.9M env-steps/s (this structure) / 10.0M (a single-big-dot +
# in-kernel-broadcast variant) vs 35.5M for ``sep`` at B=4096. The design
# targeted the separable raster's [B, size, size] bf16 dot output, assumed to
# round-trip HBM; measurement disproved the premise (the XLA path's
# throughput exceeds what that round-trip would allow, i.e. XLA already
# fuses the convert+accumulate into the dot epilogue), and a per-step
# ``pallas_call`` inside the scan costs more in lost fusion/pipelining than
# any in-kernel saving. Full post-mortem in BENCH_LOCAL.md round 3. Kept as
# an opt-in (``rollout(fused_acc=True)``, ``bench.py --impl pallas_acc``).
#
# Design: the row expansion of the separable raster is a 0/1 *selection*
# (every pixel row of board row i is the same vector), so instead of a second
# MXU dot — whose output layout forced the mid-kernel relayout that killed
# the round-1/round-2 fused-raster designs — each board row takes ONE tiny
# dot [bt, w] @ [w, size] and its result is added (broadcast over the row's
# ``block`` pixel rows + trailing gap row) straight into the aliased uint8
# accumulator tile. Per step, only the cells (B*h*w) and the accumulator
# (read+write) touch HBM.
#
# Exactness: integer arithmetic throughout (values <= 190 exact in the bf16
# dot; the accumulate is (acc_i32 + img_i32) mod 256 == uint8 wraparound add,
# bitwise what the XLA path's ``acc + storage_obs`` computes). Asserted vs the
# XLA paths in tests/test_pallas_raster.py and on real TPU (B=4096 + wide
# boards). Width-agnostic (dense cells input — works for multi-word wide
# boards too, unlike the fused step kernel).
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def _acc_geometry(h: int, w: int, size: int):
    from .raster import raster_geometry
    gap, block, inner0, inner1, pad0, pad1 = raster_geometry(h, w, size)
    a1 = np.full(size, -2, dtype=np.int32)
    for p in range(pad1, pad1 + inner1):
        t = (p - pad1) - gap
        if t < 0:
            a1[p] = -1
            continue
        i, rem = divmod(t, block + gap)
        a1[p] = i if rem < block else -1
    a62 = ((PIECE_SHADE - BACKGROUND_SHADE)
           * (a1[None, :] == np.arange(w)[:, None])).astype(np.float32)
    bgrow = (BACKGROUND_SHADE * (a1 != -2)).astype(np.float32)[None, :]
    return gap, block, pad0, a62, bgrow


def _build_acc_kernel(h: int, w: int, size: int, bt: int,
                      gap: int, block: int, pad0: int):
    bg = block + gap

    def kernel(a62_ref, bgrow_ref, cells_ref, acc_in_ref, acc_ref):
        bgrow = bgrow_ref[:].astype(jnp.int32)                 # [1, size]
        # leading gap row(s) of the inner grid
        lead = acc_in_ref[:, pad0:pad0 + gap, :].astype(jnp.int32)
        acc_ref[:, pad0:pad0 + gap, :] = (
            lead + bgrow[None, :, :]).astype(jnp.uint8)
        for i in range(h):
            cells_i = cells_ref[:, i, :]                       # [bt, w] bf16
            t = jnp.dot(cells_i, a62_ref[:],
                        preferred_element_type=jnp.float32)    # [bt, size]
            t = t.astype(jnp.int32) + bgrow                    # finished row
            s0 = pad0 + gap + i * bg
            # this board row's block pixel rows + its trailing gap row
            sl = acc_in_ref[:, s0:s0 + bg, :].astype(jnp.int32)
            rows_are_cell = jax.lax.broadcasted_iota(
                jnp.int32, (1, bg, 1), 1) < block
            add = jnp.where(rows_are_cell, t[:, None, :],
                            bgrow[None, :, :])
            acc_ref[:, s0:s0 + bg, :] = (sl + add).astype(jnp.uint8)
        # border rows add 0 -> copy through (aliasing makes this a no-op in
        # place, but interpret mode needs the explicit copy)
        acc_ref[:, :pad0, :] = acc_in_ref[:, :pad0, :]
        tail = pad0 + gap + h * bg
        acc_ref[:, tail:, :] = acc_in_ref[:, tail:, :]

    return kernel


@functools.lru_cache(maxsize=32)
def _build_acc_call(h: int, w: int, size: int, batch: int, bt: int,
                    interpret: bool):
    gap, block, pad0, a62, bgrow = _acc_geometry(h, w, size)
    grid = (batch // bt,)
    return pl.pallas_call(
        _build_acc_kernel(h, w, size, bt, gap, block, pad0),
        grid=grid,
        in_specs=[
            pl.BlockSpec((w, size), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),             # a62
            pl.BlockSpec((1, size), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),             # bgrow
            pl.BlockSpec((bt, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),             # cells tile
            pl.BlockSpec((bt, size, size), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),             # acc tile (in)
        ],
        out_specs=pl.BlockSpec((bt, size, size), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, size, size), jnp.uint8),
        input_output_aliases={3: 0},
        interpret=interpret)


def raster_accumulate(cfg: EnvConfig, emitted_rows: jnp.ndarray,
                      acc: jnp.ndarray, size: int = 84, block_b: int = 128,
                      interpret: bool = None) -> jnp.ndarray:
    """acc uint8[B, size, size] += rasterize(emitted_rows), fused.

    ``emitted_rows``: packed board rows (uint32[H, B] or [H, NW, B]), piece
    burned in. Bitwise-identical to ``acc + build_observation_storage(...)``
    for grayscale/rgb configs (the rgb storage form IS the grayscale image).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    from .bitops import unpack_rows
    h, w = cfg.height, cfg.width
    b = emitted_rows.shape[-1]
    bt = next((t for t in (block_b, 256, 128, 64) if b % t == 0), b)
    # bf16 cells: Mosaic has no uint8 -> bfloat16 cast in-kernel; the XLA-side
    # unpack produces the dot operand dtype directly (still tiny: B*h*w*2 B)
    cells = unpack_rows(cfg, emitted_rows, dtype=jnp.bfloat16)  # [B, h, w]
    gap, block, pad0, a62, bgrow = _acc_geometry(h, w, size)
    call = _build_acc_call(h, w, size, b, bt, interpret)
    return call(jnp.asarray(a62, jnp.bfloat16), jnp.asarray(bgrow),
                cells, acc)
