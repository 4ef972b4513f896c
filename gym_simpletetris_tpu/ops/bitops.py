"""Pack/unpack between bit-packed batch-minor rows and dense boards.

The reference stores the board as a float ``(width, height)`` array indexed
``board[x, y]`` (tetris_env.py:140); the engine packs each row into a uint32 and
keeps the batch on the minor axis: ``rows[H, B]``. These converters bridge the
layouts at API boundaries (observations, tests).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.config import EnvConfig, XSHIFT


def unpack_cells(cfg: EnvConfig, rows: jnp.ndarray, dtype=jnp.uint8) -> jnp.ndarray:
    """uint32[H, B] -> dense [H, W, B] (still batch-minor)."""
    shifts = (jnp.arange(cfg.width, dtype=jnp.uint32) + XSHIFT)[None, :, None]
    bits = (rows[:, None, :] >> shifts) & jnp.uint32(1)
    return bits.astype(dtype)


def unpack_rows(cfg: EnvConfig, rows: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """uint32[H, B] -> dense [B, H, W] (batch-major, image orientation).
    Transposes the packed [H, B] first (a cheap 2D transpose) and unpacks
    bits in the target layout, avoiding a strided 3D transpose of the
    W-times-larger dense array."""
    shifts = (jnp.arange(cfg.width, dtype=jnp.uint32) + XSHIFT)[None, None, :]
    bits = (rows.T[:, :, None] >> shifts) & jnp.uint32(1)     # [B, H, W]
    return bits.astype(dtype)


def unpack_board(cfg: EnvConfig, rows: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """uint32[H, B] -> dense [B, W, H] in the reference's board[x, y] orientation."""
    shifts = (jnp.arange(cfg.width, dtype=jnp.uint32) + XSHIFT)[None, :, None]
    bits = (rows.T[:, None, :] >> shifts) & jnp.uint32(1)     # [B, W, H]
    return bits.astype(dtype)


def pack_board(cfg: EnvConfig, board: np.ndarray) -> np.ndarray:
    """Dense (W, H) or (B, W, H) board[x, y] -> packed uint32 rows [H] / [H, B] (host)."""
    board = np.asarray(board)
    single = board.ndim == 2
    if single:
        board = board[None]
    b, w, h = board.shape
    assert w == cfg.width and h == cfg.height, (board.shape, cfg.width, cfg.height)
    rows = np.zeros((h, b), dtype=np.uint32)
    for x in range(w):
        rows |= (board[:, x, :] != 0).astype(np.uint32).T << np.uint32(x + XSHIFT)
    return rows[:, 0] if single else rows
