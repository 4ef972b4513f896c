"""Batched environment state as a single pytree.

The reference keeps all game state as mutable attributes on ``TetrisEngine``
(``tetris_env.py:126-181``): a float board indexed ``board[x, y]``, the active piece
as a mutable offset list + float anchor, and an assortment of counters. Here the
whole engine state is one immutable ``flax.struct`` pytree of batched arrays, so it
can be jitted over, vmapped, donated, sharded over a device mesh, and checkpointed
with orbax as-is.

Board representation: **bit-packed rows**, ``uint32[B, H]``, column ``x`` at bit
``x + XSHIFT``. This makes collision an AND, line-clear detection a row compare,
hole counting a popcount over a prefix-OR, and keeps the per-step working set at
``B*H*4`` bytes instead of ``B*H*W`` floats.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from .config import EnvConfig


@struct.dataclass
class EnvState:
    """One array per reference attribute; leading dim B is the env batch.

    Reference attribute mapping (tetris_env.py):
      rows          <- self.board (:140), piece erased (the board between steps
                       always has the active piece cleared; see step emission
                       :301-303 — the final _set_piece(False) unconditionally
                       zeroes the piece cells, which is what produces the
                       spawn-overlap / death erase quirks)
      piece, rot    <- self.shape / self.shape_name (:171-172) as (id, rotation)
      ax, ay        <- self.anchor (:170), already int-coerced (:244)
      lock          <- self._lock_delay (:176)
      time          <- self.time (:165)
      score         <- self.score (:166)
      holes         <- self.holes (:167), only recomputed at lock (:278,:284)
      lines_cleared <- self.lines_cleared (:168)
      piece_height  <- self.piece_height (:169)
      deaths        <- self.n_deaths (:173)
      shape_counts  <- self.shape_counts (:181), int32[B, 7]
      key           <- (new) per-batch jax PRNG key; the reference's only RNG is
                       the global Python Mersenne Twister (:2, :187)
    """

    rows: jnp.ndarray          # uint32[B, H]
    piece: jnp.ndarray         # int32[B] in [0, 7)
    rot: jnp.ndarray           # int32[B] in [0, 4)
    ax: jnp.ndarray            # int32[B]
    ay: jnp.ndarray            # int32[B]
    lock: jnp.ndarray          # int32[B]
    time: jnp.ndarray          # int32[B]
    score: jnp.ndarray         # int32[B]
    holes: jnp.ndarray         # int32[B]
    lines_cleared: jnp.ndarray # int32[B]
    piece_height: jnp.ndarray  # int32[B]
    deaths: jnp.ndarray        # int32[B]
    shape_counts: jnp.ndarray  # int32[B, 7]
    key: jnp.ndarray           # jax PRNG key data, uint32[B, 2]

    @property
    def batch_size(self) -> int:
        return self.rows.shape[0]


def init_state(config: EnvConfig, batch_size: int, key) -> EnvState:
    """Fresh-engine state, mirroring TetrisEngine.__init__ (tetris_env.py:163-181):
    time/score start at -1, everything else zero, no piece spawned yet (anchor/shape
    are None there; here piece/rot/anchor are zeros and stepping before reset is
    undefined, as in the reference where it raises)."""
    import jax

    b = batch_size
    i32 = jnp.int32
    keys = jax.random.split(key, b)
    return EnvState(
        rows=jnp.zeros((b, config.height), dtype=jnp.uint32),
        piece=jnp.zeros((b,), i32),
        rot=jnp.zeros((b,), i32),
        ax=jnp.zeros((b,), i32),
        ay=jnp.zeros((b,), i32),
        lock=jnp.zeros((b,), i32),
        time=jnp.full((b,), -1, i32),
        score=jnp.full((b,), -1, i32),
        holes=jnp.zeros((b,), i32),
        lines_cleared=jnp.zeros((b,), i32),
        piece_height=jnp.zeros((b,), i32),
        deaths=jnp.zeros((b,), i32),
        shape_counts=jnp.zeros((b, 7), i32),
        key=keys,
    )
