"""Episode video/GIF export through the exact observation rasterizer.

The reference repo showcases a GIF (README.md:6) but has no export code. This
renders episodes with the same pixel-exact raster as ``render('rgb_array')``
(160px) or any size, and writes GIFs via PIL when available.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from ..core.config import EnvConfig
from ..ops.bitops import unpack_cells
from ..ops.raster import rasterize, grayscale_to_rgb


def frames_from_rows(cfg: EnvConfig, rows_history, size: int = 160,
                     env_index: int = 0) -> np.ndarray:
    """Packed-rows history (list/array of uint32[H, B]) -> uint8[T, size, size, 3]."""
    frames = []
    for rows in rows_history:
        cells = unpack_cells(cfg, jnp.asarray(rows),
                             dtype=jnp.uint8)          # [H, W, B]
        cells = cells[:, :, env_index][None]           # [1, H, W]
        img = rasterize(cells, cfg.height, cfg.width, size)
        frames.append(np.asarray(grayscale_to_rgb(img[0])))
    return np.stack(frames)


def write_gif(frames: np.ndarray, path: str, fps: int = 8) -> str:
    """uint8[T, H, W, 3] -> animated GIF (fps defaults to the reference's
    render cap, tetris_env.py:339). Requires PIL."""
    from PIL import Image
    imgs = [Image.fromarray(f) for f in frames]
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=int(1000 / fps), loop=0)
    return path


def record_episode(env, policy=None, max_steps: int = 500, size: int = 160,
                   seed: int = 0) -> np.ndarray:
    """Roll one episode of a ``TetrisVectorEnv`` (batch 1+) and return frames
    of env 0. ``policy(obs, t) -> actions`` defaults to random."""
    import jax

    key = jax.random.PRNGKey(seed)
    obs, state = env.reset(key)
    rng = np.random.RandomState(seed)
    rows_history = [env.render_rows(state)]
    for t in range(max_steps):
        if policy is None:
            a = rng.randint(0, 7, env.batch_size)
        else:
            a = policy(obs, t)
        obs, state, reward, done, info = env.step(state, jnp.asarray(a))
        rows_history.append(env.render_rows(state))
        if bool(np.asarray(done)[0]):
            break
    return frames_from_rows(env.config, rows_history, size=size)
