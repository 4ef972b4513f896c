"""Functional batched environment API (the framework's main entry point).

Design follows the functional-RL-env idiom (gymnax-style) rather than the
reference's mutable ``gym.Env`` object (tetris_env.py:338-467): state is an
explicit pytree, ``reset``/``step`` are pure jitted functions, and the batch
dimension is first-class (shardable over a device mesh — see ``parallel/``).

Semantics per step/reset match the reference exactly (see core/engine.py);
observation conversion matches ``TetrisEnv._observation`` (tetris_env.py:413-433)
including the float32 cast (:400) and the empty-board reset observation (:405-411).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import EnvConfig
from ..core import engine as E
from ..core.pieces import PIECE_NAMES
from ..core.state import EnvState, init_state
from ..ops.bitops import unpack_rows, unpack_board
from ..ops.raster import rasterize, grayscale_to_rgb
from . import spaces


def build_observation(cfg: EnvConfig, emitted_rows: jnp.ndarray) -> jnp.ndarray:
    """Packed board rows uint32[H, B] (piece burned in) -> obs per cfg.obs_type.

    ram:       [B, W, H] (board[x, y] orientation, tetris_env.py:421-424)
    grayscale: [B, 84, 84] with values {0, 128, 190} (:426-431; the declared
               [0,1] Box range mismatch is a reference quirk)
    rgb:       [B, 84, 84, 3] (:433)
    extend_dims appends a trailing channel axis for ram/grayscale (:424, :431).
    dtype: float32 (reference parity, :400) or uint8 (cfg.obs_dtype="uint8" —
    the native palette; 4x less HBM traffic for image observations).
    """
    dt = jnp.float32 if cfg.obs_dtype == "float32" else jnp.uint8
    if cfg.obs_type == "ram":
        obs = unpack_board(cfg, emitted_rows, dtype=dt)           # [B, W, H]
        return obs[..., None] if cfg.extend_dims else obs
    impl = cfg.resolved_raster_impl
    if impl == "pallas":
        from ..ops.pallas_raster import rasterize_rows_pallas
        img = rasterize_rows_pallas(cfg, emitted_rows, 84)
    else:
        cells = unpack_rows(cfg, emitted_rows, dtype=jnp.uint8)   # [B, H, W]
        img = rasterize(cells, cfg.height, cfg.width, 84, impl=impl)
    if cfg.obs_type == "grayscale":
        obs = img.astype(dt)
        return obs[..., None] if cfg.extend_dims else obs
    return grayscale_to_rgb(img).astype(dt)


def _select_done(done: jnp.ndarray, new: EnvState, old: EnvState) -> EnvState:
    """Per-env select over the state pytree (batch-minor aware): batch is the
    last axis of rows/shape_counts, the only axis of per-env scalars, and the
    engine key is global (the advanced key is kept unconditionally)."""
    last = lambda n, o: jnp.where(done[None, :], n, o)
    vec = lambda n, o: jnp.where(done, n, o)
    return old.replace(
        rows=last(new.rows, old.rows),
        piece=vec(new.piece, old.piece),
        rot=vec(new.rot, old.rot),
        ax=vec(new.ax, old.ax),
        ay=vec(new.ay, old.ay),
        lock=vec(new.lock, old.lock),
        time=vec(new.time, old.time),
        score=vec(new.score, old.score),
        holes=vec(new.holes, old.holes),
        lines_cleared=vec(new.lines_cleared, old.lines_cleared),
        piece_height=vec(new.piece_height, old.piece_height),
        deaths=vec(new.deaths, old.deaths),
        shape_counts=last(new.shape_counts, old.shape_counts),
        key=new.key,
    )


def apply_reset_mask(cfg: EnvConfig, state: EnvState, emitted: jnp.ndarray,
                     mask: jnp.ndarray):
    """Episode-reset the envs selected by ``mask`` (bool[B]): their state is
    clear()ed (carry-over semantics) and their emitted board becomes the empty
    reset board. Shared by auto_reset (mask = done) and the gymnasium
    next-step-autoreset adapter (mask = pending-from-last-step)."""
    cleared_state, cleared_rows = E.engine_clear(cfg, state)
    new_state = _select_done(mask, cleared_state, state)
    return new_state, jnp.where(mask[None, :], cleared_rows, emitted)


def reset_fn(cfg: EnvConfig, batch_size: int, key,
             injected_r: Optional[jnp.ndarray] = None
             ) -> Tuple[jnp.ndarray, EnvState]:
    """Fresh engine + episode reset. The observation is the *empty* board —
    the reference's reset returns the board before the spawned piece is burned
    in (tetris_env.py:313-315, :405-411)."""
    state = init_state(cfg, batch_size, key)
    state, emitted = E.engine_clear(cfg, state, injected_r=injected_r)
    return build_observation(cfg, emitted), state


def soft_reset_fn(cfg: EnvConfig, state: EnvState,
                  injected_r: Optional[jnp.ndarray] = None):
    """Episode reset that carries over lock counter / deaths / shape counts,
    exactly like ``TetrisEngine.clear`` (tetris_env.py:306-315)."""
    state, emitted = E.engine_clear(cfg, state, injected_r=injected_r)
    return build_observation(cfg, emitted), state


def step_fn(cfg: EnvConfig, state: EnvState, action: jnp.ndarray,
            injected_r: Optional[jnp.ndarray] = None):
    """One batched transition. Returns (obs, state, reward, done, info).

    With ``cfg.auto_reset``, envs that died are re-cleared in the same call and
    their observation is the reset observation (empty board); reward/done still
    report the terminal transition.
    """
    if cfg.step_impl == "pallas":
        from ..ops.pallas_step import engine_step_pallas
        b = state.rows.shape[1]
        # largest lane-aligned tile that divides the batch; small/unaligned
        # batches fall back to one whole-batch tile
        bb = next((t for t in (512, 384, 256, 128) if b % t == 0), b)
        out = engine_step_pallas(cfg, state, action, injected_r=injected_r,
                                 block_b=bb)
    else:
        out = E.engine_step(cfg, state, action, injected_r=injected_r)
    new_state, emitted = out.state, out.emitted_rows
    if cfg.auto_reset:
        new_state, emitted = apply_reset_mask(cfg, new_state, emitted,
                                              out.done)
    obs = build_observation(cfg, emitted)
    info = make_info(new_state)
    return obs, new_state, out.reward, out.done, info


def make_info(state: EnvState) -> dict:
    """Batched analog of ``get_info`` (tetris_env.py:232-241): same keys, arrays
    over the batch; ``current_piece`` is an int id into PIECE_NAMES; the
    ``statistics`` live-dict aliasing quirk becomes a plain int32[B, 7] copy."""
    return {
        "time": state.time,
        "current_piece": state.piece,
        "score": state.score,
        "lines_cleared": state.lines_cleared,
        "holes": state.holes,
        "deaths": state.deaths,
        "statistics": state.shape_counts.T,  # [B, 7], batch-major for consumers
    }


def build_rollout(cfg: EnvConfig, batch_size: int, obs_shape,
                  with_obs: bool = True):
    """Scan-fused multi-step rollout builder shared by the local and sharded
    envs. Returns a function (state, actions[T, B]) ->
    (final_state, obs_acc, reward[T, B], done[T, B]).

    ``with_obs=True`` renders the observation every step and folds it into a
    [B, *obs_shape] accumulator in the obs dtype, keeping the full observation
    pipeline live under XLA's DCE (an obs-dtype accumulator is loop-in-place
    friendly; a carry-replace buffer measured pathologically slow in XLA's
    while-loop handling). ``with_obs=False`` runs the bare engine.
    """
    acc_dtype = jnp.float32 if cfg.obs_dtype == "float32" else jnp.uint8

    def rollout(s, acts):
        def body(carry, a):
            st, acc = carry
            obs, st, r, d, _ = step_fn(cfg, st, a)
            if with_obs:
                acc = acc + obs
            return (st, acc), (r, d)
        obs0 = jnp.zeros((batch_size,) + tuple(obs_shape), dtype=acc_dtype)
        (final, acc), (rew, done) = jax.lax.scan(body, (s, obs0), acts)
        return final, acc, rew, done

    return rollout


class TetrisVectorEnv:
    """Batched TPU-native SimpleTetris. All methods are jit-compiled per
    (config, batch_size); state is explicit and device-resident.

    >>> env = TetrisVectorEnv(EnvConfig(obs_type="ram"), batch_size=4096)
    >>> obs, state = env.reset(jax.random.PRNGKey(0))
    >>> obs, state, reward, done, info = env.step(state, actions)
    """

    PIECE_NAMES = PIECE_NAMES

    def __init__(self, config: EnvConfig = EnvConfig(), batch_size: int = 1):
        self.config = config
        self.batch_size = batch_size
        self.observation_space = spaces.observation_space(config)
        self.action_space = spaces.action_space()
        cfg = config
        self._reset = jax.jit(lambda key: reset_fn(cfg, batch_size, key))
        self._reset_inj = jax.jit(
            lambda key, r: reset_fn(cfg, batch_size, key, injected_r=r))
        self._step = jax.jit(lambda s, a: step_fn(cfg, s, a))
        self._step_inj = jax.jit(lambda s, a, r: step_fn(cfg, s, a, injected_r=r))
        self._soft_reset = jax.jit(lambda s: soft_reset_fn(cfg, s))
        self._soft_reset_inj = jax.jit(lambda s, r: soft_reset_fn(cfg, s, r))
        self._render = jax.jit(lambda s: E.render_rows(cfg, s))
        self._vac = jax.jit(lambda s: E.valid_action_count(cfg, s))
        self._rollout_jit = {}

    # -- core API ---------------------------------------------------------------
    def reset(self, key, injected_r=None):
        if injected_r is None:
            return self._reset(key)
        return self._reset_inj(key, jnp.asarray(injected_r))

    def step(self, state: EnvState, action, injected_r=None):
        if injected_r is None:
            return self._step(state, jnp.asarray(action))
        return self._step_inj(state, jnp.asarray(action), jnp.asarray(injected_r))

    def soft_reset(self, state: EnvState, injected_r=None):
        if injected_r is None:
            return self._soft_reset(state)
        return self._soft_reset_inj(state, jnp.asarray(injected_r))

    # -- aux --------------------------------------------------------------------
    def render_rows(self, state: EnvState) -> jnp.ndarray:
        """Packed board with active piece burned in (TetrisEngine.render)."""
        return self._render(state)

    def valid_action_count(self, state: EnvState) -> jnp.ndarray:
        return self._vac(state)

    def rollout(self, state: EnvState, actions: jnp.ndarray,
                with_obs: bool = True):
        """Scan ``T`` pre-chosen action batches: actions int32[T, B].

        Returns (final_state, obs_acc, reward[T, B], done[T, B]).

        ``with_obs=True`` renders the observation every step and folds it into
        a [B, *obs_shape] accumulator in the obs dtype, keeping the full
        observation pipeline live under XLA's DCE — this is what the
        throughput bench measures. ``with_obs=False`` benches the bare engine.
        Use cfg.auto_reset for horizons past episode ends.
        """
        cfg = self.config

        fn = self._rollout_jit.get(with_obs)
        if fn is None:
            fn = jax.jit(build_rollout(cfg, self.batch_size,
                                       self.observation_space.shape, with_obs))
            self._rollout_jit[with_obs] = fn
        return fn(state, jnp.asarray(actions))
