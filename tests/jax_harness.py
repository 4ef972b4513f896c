"""Single-env JAX engine driver used by tests: jitted B=1 step/clear with an
injected RNG stream (parity mode)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gym_simpletetris_tpu.core import engine as E
from gym_simpletetris_tpu.core.config import EnvConfig
from gym_simpletetris_tpu.core.state import init_state
from gym_simpletetris_tpu.ops.bitops import unpack_board


class JaxOneEnv:
    """B=1 wrapper over the batched engine, driven by injected reference draws."""

    def __init__(self, cfg: EnvConfig, seed: int = 0):
        self.cfg = cfg
        self._step = jax.jit(
            lambda s, a, r: E.engine_step(cfg, s, a, injected_r=r))
        self._clear = jax.jit(
            lambda s, r: E.engine_clear(cfg, s, injected_r=r))
        self._vac = jax.jit(lambda s: E.valid_action_count(cfg, s))
        self.state = init_state(cfg, 1, jax.random.PRNGKey(seed))

    def clear(self, r: int):
        self.state, emitted = self._clear(self.state, jnp.array([r], jnp.int32))
        return np.asarray(unpack_board(self.cfg, emitted))[0]

    def step(self, action: int, r: int = 0):
        out = self._step(self.state, jnp.array([action], jnp.int32),
                         jnp.array([r], jnp.int32))
        self.state = out.state
        board = np.asarray(unpack_board(self.cfg, out.emitted_rows))[0]
        return board, float(out.reward[0]), bool(out.done[0])

    def valid_action_count(self) -> int:
        return int(self._vac(self.state)[0])

    def info(self):
        s = self.state
        from gym_simpletetris_tpu.core.pieces import PIECE_NAMES
        return {
            "time": int(s.time[0]),
            "current_piece": PIECE_NAMES[int(s.piece[0])],
            "score": int(s.score[0]),
            "lines_cleared": int(s.lines_cleared[0]),
            "holes": int(s.holes[0]),
            "deaths": int(s.deaths[0]),
            "statistics": {
                n: int(c)
                for n, c in zip(PIECE_NAMES, np.asarray(s.shape_counts)[:, 0])
            },
        }
