"""Vectorized one-step-lookahead heuristic policy (no learning).

A classic Tetris baseline: for each of the 7 primitive actions, simulate one
engine step on a tiled copy of the batch and score the resulting board with the
standard height/holes/lines features (the same features the reference's reward
flags expose: nonempty rows :287, holes :218-220, cleared lines :205-216), then
pick the best action per env. Runs entirely on device; useful as an eval
baseline and for generating demonstration data.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.config import EnvConfig
from ..core import engine as E
from ..core.engine import NUM_ACTIONS
from ..core.state import EnvState


@dataclasses.dataclass(frozen=True)
class HeuristicWeights:
    holes: float = 4.0
    height: float = 1.0
    lines: float = 8.0      # reward term
    death: float = 1000.0
    bumpiness: float = 0.25


def _tile_state(state: EnvState, n: int) -> EnvState:
    """Repeat each env n times along the batch (batch-minor aware)."""
    last = lambda x: jnp.tile(x, (1,) * (x.ndim - 1) + (n,))
    vec = lambda x: jnp.tile(x, (n,))
    return state.replace(
        rows=last(state.rows), piece=vec(state.piece), rot=vec(state.rot),
        ax=vec(state.ax), ay=vec(state.ay), lock=vec(state.lock),
        time=vec(state.time), score=vec(state.score), holes=vec(state.holes),
        lines_cleared=vec(state.lines_cleared),
        piece_height=vec(state.piece_height), deaths=vec(state.deaths),
        shape_counts=last(state.shape_counts), key=state.key)


def _column_heights(cfg: EnvConfig, rows: jnp.ndarray) -> jnp.ndarray:
    """[W, B] column heights (cells above the lowest empty run top)."""
    from ..ops.bitops import unpack_cells
    cells = unpack_cells(cfg, rows, dtype=jnp.int32)          # [H, W, B]
    h = cfg.height
    top = jnp.argmax(cells, axis=0)                           # first filled y
    any_fill = cells.max(axis=0) > 0
    return jnp.where(any_fill, h - top, 0)                    # [W, B]


def board_score(cfg: EnvConfig, state: EnvState, reward, done,
                w: HeuristicWeights) -> jnp.ndarray:
    """Lower is better."""
    holes = E.count_holes(cfg, state.rows).astype(jnp.float32)
    height = E.nonempty_rows(cfg, state.rows).astype(jnp.float32)
    heights = _column_heights(cfg, state.rows).astype(jnp.float32)
    bump = jnp.abs(jnp.diff(heights, axis=0)).sum(axis=0)
    return (w.holes * holes + w.height * height + w.bumpiness * bump
            - w.lines * reward + w.death * done.astype(jnp.float32))


def make_heuristic_policy(cfg: EnvConfig, weights: HeuristicWeights = None):
    """Returns a jitted ``policy(state) -> action int32[B]``."""
    w = weights or HeuristicWeights()

    @jax.jit
    def policy(state: EnvState) -> jnp.ndarray:
        b = state.rows.shape[1]
        tiled = _tile_state(state, NUM_ACTIONS)
        actions = jnp.repeat(jnp.arange(NUM_ACTIONS, dtype=jnp.int32), b)
        out = E.engine_step(cfg, tiled, actions)
        score = board_score(cfg, out.state, out.reward, out.done, w)
        per_action = score.reshape(NUM_ACTIONS, b)            # [A, B]
        return jnp.argmin(per_action, axis=0).astype(jnp.int32)

    return policy
