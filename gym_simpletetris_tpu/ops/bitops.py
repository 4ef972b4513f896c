"""Pack/unpack between bit-packed batch-minor rows and dense boards.

The reference stores the board as a float ``(width, height)`` array indexed
``board[x, y]`` (tetris_env.py:140); the engine packs each row into uint32
words and keeps the batch on the minor axis: ``rows[H, B]`` (width <= 24) or
``rows[H, NW, B]`` (wide boards; global bit ``x + XSHIFT`` in word
``(x + XSHIFT) // 32``). These converters bridge the layouts at API boundaries
(observations, tests). All functions accept both layouts.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.config import EnvConfig, XSHIFT


def _word_of(x: int) -> int:
    return (x + XSHIFT) // 32


def _bit_of(x: int) -> int:
    return (x + XSHIFT) % 32


def _word_ranges(cfg: EnvConfig):
    """Per word w: the contiguous column range [lo, hi) it holds, plus the
    in-word shift array for those columns."""
    out = []
    for w in range(cfg.num_words):
        xs = [x for x in range(cfg.width) if _word_of(x) == w]
        if xs:
            out.append((w, xs[0], xs[-1] + 1,
                        np.array([_bit_of(x) for x in xs], dtype=np.uint32)))
    return out


def unpack_cells(cfg: EnvConfig, rows: jnp.ndarray, dtype=jnp.uint8) -> jnp.ndarray:
    """Packed rows -> dense [H, W, B] (still batch-minor)."""
    if rows.ndim == 2:
        shifts = (jnp.arange(cfg.width, dtype=jnp.uint32) + XSHIFT)[None, :, None]
        bits = (rows[:, None, :] >> shifts) & jnp.uint32(1)
        return bits.astype(dtype)
    parts = [(rows[:, w, None, :] >> jnp.asarray(sh)[None, :, None])
             & jnp.uint32(1) for (w, lo, hi, sh) in _word_ranges(cfg)]
    return jnp.concatenate(parts, axis=1).astype(dtype)


def unpack_rows(cfg: EnvConfig, rows: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Packed rows -> dense [B, H, W] (batch-major, image orientation).
    Transposes the packed array first (a cheap transpose of the small packed
    form) and unpacks bits in the target layout, avoiding a strided 3D
    transpose of the W-times-larger dense array."""
    if rows.ndim == 2:
        shifts = (jnp.arange(cfg.width, dtype=jnp.uint32) + XSHIFT)[None, None, :]
        bits = (rows.T[:, :, None] >> shifts) & jnp.uint32(1)     # [B, H, W]
        return bits.astype(dtype)
    rt = rows.transpose(2, 0, 1)                                  # [B, H, NW]
    parts = [(rt[:, :, w, None] >> jnp.asarray(sh)[None, None, :])
             & jnp.uint32(1) for (w, lo, hi, sh) in _word_ranges(cfg)]
    return jnp.concatenate(parts, axis=2).astype(dtype)


def unpack_board(cfg: EnvConfig, rows: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Packed rows -> dense [B, W, H] in the reference's board[x, y] orientation."""
    if rows.ndim == 2:
        shifts = (jnp.arange(cfg.width, dtype=jnp.uint32) + XSHIFT)[None, :, None]
        bits = (rows.T[:, None, :] >> shifts) & jnp.uint32(1)     # [B, W, H]
        return bits.astype(dtype)
    rt = rows.transpose(2, 1, 0)                                  # [B, NW, H]
    parts = [(rt[:, w, None, :] >> jnp.asarray(sh)[None, :, None])
             & jnp.uint32(1) for (w, lo, hi, sh) in _word_ranges(cfg)]
    return jnp.concatenate(parts, axis=1).astype(dtype)


def pack_board(cfg: EnvConfig, board: np.ndarray) -> np.ndarray:
    """Dense (W, H) or (B, W, H) board[x, y] -> packed rows (host):
    [H] / [H, B] for width <= 24, [H, NW] / [H, NW, B] for wide boards."""
    board = np.asarray(board)
    single = board.ndim == 2
    if single:
        board = board[None]
    b, w, h = board.shape
    assert w == cfg.width and h == cfg.height, (board.shape, cfg.width, cfg.height)
    nw = cfg.num_words
    rows = np.zeros((h, nw, b), dtype=np.uint32)
    for x in range(w):
        rows[:, _word_of(x), :] |= \
            (board[:, x, :] != 0).astype(np.uint32).T << np.uint32(_bit_of(x))
    if nw == 1:
        rows = rows[:, 0]
    return rows[..., 0] if single else rows
