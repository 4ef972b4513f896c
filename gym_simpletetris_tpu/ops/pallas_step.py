"""Fused Pallas TPU kernel for the entire engine transition.

STATUS (round 3): **demoted to a reference kernel** — opt-in via
``step_impl="pallas"``, scope frozen at single-word boards (width <= 24).
Its original motivation (HBM round-trips between the step's sub-ops) was
absorbed by the scan-fused rollout, and the in-scan re-measurement at B=4096
has it tie-or-lose vs plain XLA: 145.6M vs 150.2M env-steps/s engine-only,
144.1M vs 146.3M with ram obs (quiet v5e, BENCH_LOCAL.md round 3). It stays
in-tree as the demonstration of a full branchless game transition in one
Mosaic kernel; bit-identity with ``core.engine`` holds without maintenance
because the engine's semantics are pinned by the upstream reference.

Original design (still accurate as a description of the kernel): one grid
step processes a lane-tile of the env batch, reading each state array once
and writing each output once; masks, windows, collision profiles and
compaction routing live and die on-chip.

Semantics are **identical** to ``core.engine.engine_step`` (which is itself
bitwise-parity-verified against the reference ``tetris_env.py:243-304``); the
equivalence is asserted by ``tests/test_pallas_step.py`` (interpret mode) and
on real TPU by the bench harness. RNG draws are computed *outside* the kernel
(``r_draw`` input) so parity injection and the threefry stream stay in JAX.

Kernel-shaping notes:
- batch tile is the lane axis (multiple of 128); every "scalar-per-env" is a
  ``[1, bt]`` row vector; per-row arrays are ``[H, bt]``.
- the (piece, rot) -> row-mask table lookup is a one-hot f32 matmul (MXU);
  per-lane dynamic indexing does not exist on the VPU.
- prefix-OR / prefix-sum over the H axis are unrolled log-doubling passes
  (no ``associative_scan`` inside Pallas).
- line compaction routes rows through a ``[H, H, bt]`` compare-reduce in VMEM.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import EnvConfig, XSHIFT
from ..core.pieces import ROWMASKS_FLAT, NROWS, DY_OFF
from ..core.engine import (
    StepOut, A_LEFT, A_RIGHT, A_HARD, A_SOFT, A_ROTL, A_ROTR,
    _SCORES_TAB, draw_spawn_r, _advance_key)
from ..core.state import EnvState

_U32 = jnp.uint32
_I32 = jnp.int32
_F32 = jnp.float32


def _iota_rows(n, bt):
    return jax.lax.broadcasted_iota(_I32, (n, bt), 0)


def _prefix_or_down(a, h):
    """Inclusive prefix OR along axis 0 (top->bottom) via log-doubling."""
    s = 1
    while s < h:
        shifted = jnp.pad(a, ((s, 0), (0, 0)))[:h]
        a = a | shifted
        s *= 2
    return a


def _prefix_sum_down(a, h):
    """Inclusive prefix sum along axis 0 via log-doubling."""
    s = 1
    while s < h:
        shifted = jnp.pad(a, ((s, 0), (0, 0)))[:h]
        a = a + shifted
        s *= 2
    return a


def _onehot_select_u32(pred, vals):
    """Select the single row where ``pred`` holds (one-hot along axis 0) as a
    [1, bt] u32. Mosaic has no unsigned reductions, so route through an i32
    bitcast + sum (exact: at most one non-zero term per lane)."""
    masked = jnp.where(pred, vals, _U32(0))
    as_i32 = jax.lax.bitcast_convert_type(masked, _I32)
    s = jnp.sum(as_i32, axis=0, keepdims=True)
    return jax.lax.bitcast_convert_type(s, _U32)


def _popcount(x):
    """uint32 popcount via SWAR bit trick (elementwise, VPU-friendly)."""
    x = x - ((x >> _U32(1)) & _U32(0x55555555))
    x = (x & _U32(0x33333333)) + ((x >> _U32(2)) & _U32(0x33333333))
    x = (x + (x >> _U32(4))) & _U32(0x0F0F0F0F)
    return (x * _U32(0x01010101)) >> _U32(24)


def _build_kernel(cfg: EnvConfig, bt: int):
    H = cfg.height
    valid = np.uint32(cfg.valid_mask)
    notvalid = np.uint32(~cfg.valid_mask & 0xFFFFFFFF)
    lock_mod = cfg.lock_modulus
    spawn_x = cfg.spawn_x
    table_f32 = ROWMASKS_FLAT.astype(np.float32)              # [28, NROWS]

    def masks_for(tab, pr, ax_shift):
        """tab: f32[NROWS, 28]; pr: [1, bt] flat piece*4+rot; ax_shift: [1, bt]
        -> u32[NROWS, bt]."""
        oh = (jax.lax.broadcasted_iota(_I32, (28, bt), 0) == pr).astype(_F32)
        m = jnp.dot(tab, oh, preferred_element_type=_F32)     # [NROWS, bt]
        # mosaic has no f32->u32 cast; go through i32 (values <= 127)
        return m.astype(_I32).astype(_U32) << ax_shift.astype(_U32)

    def collide_at_row(window, masks, ay):
        """window/masks: u32[NROWS, bt]; ay: [1, bt] -> bool[1, bt]."""
        coll = jnp.zeros((1, bt), bool)
        for k in range(NROWS):
            mk = masks[k:k + 1]
            y = ay + (k - DY_OFF)
            nonempty = mk != 0
            xo = (mk & notvalid) != 0
            hit = (window[k:k + 1] & mk) != 0
            coll = coll | ((y >= 0) & (xo | ((y >= H) & nonempty) | hit))
        return coll

    def kernel(table_ref, rows_ref, piece_ref, rot_ref, ax_ref, ay_ref,
               lock_ref, time_ref, score_ref, holes_ref, lines_ref, ph_ref,
               deaths_ref, counts_ref, action_ref, rdraw_ref,
               # outputs
               o_rows, o_piece, o_rot, o_ax, o_ay, o_lock, o_time, o_score,
               o_holes, o_lines, o_ph, o_deaths, o_counts, o_emit, o_reward,
               o_done):
        tab = table_ref[:]                                    # f32[NROWS, 28]
        rows = rows_ref[:]                                    # u32[H, bt]
        piece = piece_ref[:]                                  # i32[1, bt]
        rot = rot_ref[:]
        ax = ax_ref[:]
        ay = ay_ref[:]
        lock = lock_ref[:]
        action = action_ref[:]
        counts = counts_ref[:]                                # i32[7, bt]

        # -- candidates at current anchor row -----------------------------------
        rel = _iota_rows(H, bt) - ay + DY_OFF                 # [H, bt]
        window_rows = [_onehot_select_u32(rel == k, rows)
                       for k in range(NROWS)]
        window = jnp.concatenate(window_rows, axis=0)         # [NROWS, bt]

        pr = piece * 4 + rot
        pr_l = piece * 4 + ((rot - 1) % 4)
        pr_r = piece * 4 + ((rot + 1) % 4)
        sh = ax + (XSHIFT - 3)
        rm = masks_for(tab, pr, sh)                                # current config
        m_left = masks_for(tab, pr, sh - 1)
        m_right = masks_for(tab, pr, sh + 1)
        m_rotl = masks_for(tab, pr_l, sh)
        m_rotr = masks_for(tab, pr_r, sh)

        c_left = collide_at_row(window, m_left, ay)
        c_right = collide_at_row(window, m_right, ay)
        c_rotl = collide_at_row(window, m_rotl, ay)
        c_rotr = collide_at_row(window, m_rotr, ay)

        is_l = action == A_LEFT
        is_r = action == A_RIGHT
        is_h = action == A_HARD
        is_s = action == A_SOFT
        is_rl = action == A_ROTL
        is_rr = action == A_ROTR

        ax1 = ax + jnp.where(is_l & ~c_left, -1, 0) \
                 + jnp.where(is_r & ~c_right, 1, 0)
        rot1 = (rot + jnp.where(is_rl & ~c_rotl, -1, 0)
                + jnp.where(is_rr & ~c_rotr, 1, 0)) % 4

        # -- dense profile at post-action config --------------------------------
        masks1 = masks_for(tab, piece * 4 + rot1, ax1 + (XSHIFT - 3))
        rows_pad = jnp.pad(rows, ((DY_OFF, NROWS - DY_OFF), (0, 0)))
        coll = jnp.zeros((H + 1, bt), bool)
        prof_iota = _iota_rows(H + 1, bt)
        for k in range(NROWS):
            mk = masks1[k:k + 1]                              # [1, bt]
            yk = prof_iota + (k - DY_OFF)
            nonempty = mk != 0
            xo = (mk & notvalid) != 0
            hit = (rows_pad[k:k + H + 1] & mk) != 0
            coll = coll | ((yk >= 0) & (xo | ((yk >= H) & nonempty) | hit))

        def prof_at(idx):
            oh = prof_iota == idx                             # [H+1, bt]
            hits = jnp.sum((oh & coll).astype(_I32), axis=0, keepdims=True)
            return hits > 0

        c_soft = prof_at(ay + 1)
        blocked = jnp.where((prof_iota > ay) & coll, prof_iota, H + 2)
        ay_hard = jnp.min(blocked, axis=0, keepdims=True) - 1
        ay1 = jnp.where(is_h, ay_hard, jnp.where(is_s & ~c_soft, ay + 1, ay))

        g_coll = prof_at(ay1 + 1)
        ay2 = ay1 + jnp.where(g_coll, 0, 1)
        if cfg.step_reset:
            lock0 = jnp.where(ay2 != ay1, 0, lock)
        else:
            lock0 = lock

        reward = jnp.full((1, bt), 1.0 if cfg.reward_step else 0.0, _F32)

        resting = prof_at(ay2 + 1)
        lock1 = jnp.where(resting, (lock0 + 1) % lock_mod, lock0)
        locked = resting & (lock1 == 0)

        # -- lock / clear / score / death ---------------------------------------
        rel2 = _iota_rows(H, bt) - ay2 + DY_OFF
        pb = jnp.zeros((H, bt), _U32)
        for k in range(NROWS):
            pb = pb | jnp.where(rel2 == k, masks1[k:k + 1] & valid, _U32(0))
        rows_locked = rows | jnp.where(locked, pb, _U32(0))

        full = (rows_locked & valid) == valid                 # [H, bt]
        full_i = full.astype(_I32)
        n_full = jnp.sum(full_i, axis=0, keepdims=True)       # [1, bt]
        below = n_full - _prefix_sum_down(full_i, H)
        dest = _iota_rows(H, bt) + below
        out_rows_list = [
            _onehot_select_u32((dest == j) & ~full, rows_locked)
            for j in range(H)]
        new_rows = jnp.concatenate(out_rows_list, axis=0)
        n_clear = jnp.where(locked, n_full, 0)
        rows_after = jnp.where(locked, new_rows, rows)
        o_lines[:] = lines_ref[:] + n_clear

        if cfg.advanced_clears:
            sc = jnp.zeros((1, bt), _I32)
            for i, v in enumerate(_SCORES_TAB.tolist()):
                sc = sc + jnp.where(n_clear == i, v, 0)
            reward = reward + 2.5 * sc.astype(_F32)
            score_inc = sc
        elif cfg.high_scoring:
            reward = reward + 1000.0 * n_clear.astype(_F32)
            score_inc = n_clear
        else:
            reward = reward + 100.0 * n_clear.astype(_F32)
            score_inc = n_clear
        o_score[:] = score_ref[:] + jnp.where(locked, score_inc, 0)

        death = locked & ((rows_after[0:1] & valid) != 0)
        alive_lock = locked & ~death

        above = _prefix_or_down(rows_after, H)
        holes_bits = jnp.bitwise_not(rows_after) & above & valid
        holes_new = jnp.sum(_popcount(holes_bits).astype(_I32),
                            axis=0, keepdims=True)
        old_holes = holes_ref[:]
        o_holes[:] = jnp.where(locked, holes_new, old_holes)

        nonempty_cnt = jnp.sum(((rows_after & valid) != 0).astype(_I32),
                               axis=0, keepdims=True)
        ph = ph_ref[:]
        if cfg.penalise_height:
            reward = reward - jnp.where(alive_lock, nonempty_cnt, 0).astype(_F32)
            o_ph[:] = ph
        elif cfg.penalise_height_increase:
            inc = nonempty_cnt - ph
            reward = reward - jnp.where(alive_lock & (inc > 0),
                                        10 * inc, 0).astype(_F32)
            o_ph[:] = jnp.where(alive_lock, nonempty_cnt, ph)
        else:
            o_ph[:] = ph
        if cfg.penalise_holes:
            reward = reward - jnp.where(alive_lock, 5 * holes_new, 0).astype(_F32)
        elif cfg.penalise_holes_increase:
            reward = reward - jnp.where(alive_lock,
                                        5 * (holes_new - old_holes), 0).astype(_F32)

        reward = jnp.where(death, _F32(-100.0), reward)
        o_deaths[:] = deaths_ref[:] + death.astype(_I32)

        # -- spawn (draw r precomputed outside) ---------------------------------
        r_draw = rdraw_ref[:]                                 # i32[1, bt]
        maxm = jnp.max(counts, axis=0, keepdims=True)
        m_w = 5 + maxm - counts                               # [7, bt]
        c_w = _prefix_sum_down(m_w, 7)
        piece_new = jnp.sum((c_w < r_draw).astype(_I32), axis=0, keepdims=True)
        o_piece[:] = jnp.where(alive_lock, piece_new, piece)
        rot_next = jnp.where(alive_lock, 0, rot1)
        ax_next = jnp.where(alive_lock, spawn_x, ax1)
        ay_next = jnp.where(alive_lock, 0, ay2)
        o_rot[:] = rot_next
        o_ax[:] = ax_next
        o_ay[:] = ay_next
        spawn_oh = jax.lax.broadcasted_iota(_I32, (7, bt), 0) == piece_new
        o_counts[:] = counts + jnp.where(alive_lock & spawn_oh, 1, 0)

        # -- emit + erase quirks ------------------------------------------------
        m_emit = masks_for(tab, o_piece[:] * 4 + rot_next,
                           ax_next + (XSHIFT - 3))
        rel3 = _iota_rows(H, bt) - ay_next + DY_OFF
        pb_e = jnp.zeros((H, bt), _U32)
        for k in range(NROWS):
            pb_e = pb_e | jnp.where(rel3 == k, m_emit[k:k + 1] & valid, _U32(0))
        o_emit[:] = rows_after | pb_e
        o_rows[:] = rows_after & jnp.bitwise_not(pb_e)

        o_lock[:] = lock1
        o_time[:] = time_ref[:] + 1
        o_reward[:] = reward
        o_done[:] = death.astype(_I32)

    return kernel


@functools.lru_cache(maxsize=32)
def _build_step(cfg: EnvConfig, batch: int, bt: int, interpret: bool):
    H = cfg.height
    grid = (batch // bt,)
    row_spec = pl.BlockSpec((H, bt), lambda i: (0, i), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, bt), lambda i: (0, i), memory_space=pltpu.VMEM)
    cnt_spec = pl.BlockSpec((7, bt), lambda i: (0, i), memory_space=pltpu.VMEM)

    tab_spec = pl.BlockSpec((NROWS, 28), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [tab_spec, row_spec] + [vec_spec] * 11 + [cnt_spec, vec_spec,
                                                         vec_spec]
    out_specs = ([row_spec] + [vec_spec] * 11 + [cnt_spec] +
                 [row_spec, vec_spec, vec_spec])
    i32v = jax.ShapeDtypeStruct((1, batch), jnp.int32)
    out_shape = [
        jax.ShapeDtypeStruct((H, batch), jnp.uint32),   # rows
        i32v, i32v, i32v, i32v, i32v, i32v, i32v, i32v, i32v, i32v, i32v,
        jax.ShapeDtypeStruct((7, batch), jnp.int32),    # counts
        jax.ShapeDtypeStruct((H, batch), jnp.uint32),   # emitted
        jax.ShapeDtypeStruct((1, batch), jnp.float32),  # reward
        jax.ShapeDtypeStruct((1, batch), jnp.int32),    # done
    ]
    kern = _build_kernel(cfg, bt)
    return pl.pallas_call(
        kern, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret)


def engine_step_pallas(cfg: EnvConfig, state: EnvState, action: jnp.ndarray,
                       injected_r: Optional[jnp.ndarray] = None,
                       block_b: int = 512, interpret: bool = False) -> StepOut:
    """Drop-in fused-kernel replacement for ``core.engine.engine_step``.

    The batch must be a multiple of ``block_b`` (itself a multiple of 128 on
    real TPU; any size in interpret mode). RNG/parity draws are computed here
    in JAX and fed to the kernel.
    """
    B = state.rows.shape[1]
    bt = min(block_b, B)
    if B % bt:
        raise ValueError(f"batch {B} must be a multiple of block_b {bt}")

    carry_key, draw_key = _advance_key(state.key)
    if injected_r is None:
        r_draw = draw_spawn_r(draw_key, state.shape_counts)
    else:
        r_draw = injected_r.astype(_I32)

    row = lambda x: x.reshape(1, B)
    call = _build_step(cfg, B, bt, interpret)
    table = jnp.asarray(ROWMASKS_FLAT.astype(np.float32).T)   # [NROWS, 28]
    (rows, piece, rot, ax, ay, lock, time, score, holes, lines, ph, deaths,
     counts, emitted, reward, done) = call(
        table, state.rows, row(state.piece), row(state.rot), row(state.ax),
        row(state.ay), row(state.lock), row(state.time), row(state.score),
        row(state.holes), row(state.lines_cleared), row(state.piece_height),
        row(state.deaths), state.shape_counts, row(action.astype(_I32)),
        row(r_draw))

    flat = lambda x: x.reshape(B)
    new_state = state.replace(
        rows=rows, piece=flat(piece), rot=flat(rot), ax=flat(ax),
        ay=flat(ay), lock=flat(lock), time=flat(time), score=flat(score),
        holes=flat(holes), lines_cleared=flat(lines), piece_height=flat(ph),
        deaths=flat(deaths), shape_counts=counts, key=carry_key)
    return StepOut(new_state, emitted, flat(reward), flat(done) != 0)
