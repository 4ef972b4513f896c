"""Pure, jittable, batched Tetris transition engine.

This is a ground-up TPU redesign of the reference engine
(``/root/reference/gym_simpletetris/envs/tetris_env.py:125-335``), not a translation:

- The board is bit-packed: ``uint32[B, H]`` rows, column ``x`` at bit ``x + XSHIFT``.
  Collision is a bitwise AND, a full row is a compare against the valid-bit mask,
  holes are a popcount over a prefix-OR, and piece placement is a shifted constant.
- There is no data-dependent control flow. Every step evaluates a small set of
  candidate moves plus one dense "collision at every anchor height" profile, then
  selects branchlessly. ``hard_drop`` (a Python ``while True`` fixpoint loop in the
  reference, ``tetris_env.py:54-59``) becomes an argmin over that profile.
- Everything is batched over a leading env dimension B and safe under
  ``jit``/``vmap``/``shard_map``; the batch never interacts across envs.

Exact behavioral parity with the reference ``step`` (``tetris_env.py:243-304``) is the
contract, including its quirks (verified by ``tests/test_parity.py``):

- cells with ``y < 0`` skip *all* collision checks including x-bounds
  (``tetris_env.py:29-36``): the ``y >= 0`` gate below is applied before x-bounds;
- gravity applies one extra soft-drop after every action (``:247``), so the
  soft-drop action moves two cells;
- the lock-delay counter wraps modulo ``lock_delay+1`` and is *not* cleared when a
  piece slides off a ledge unless ``step_reset`` is set (``:175, :248-249, :260``);
- on lock the piece is burned in, lines clear with stable downward compaction
  (``:205-216``), scoring applies (``:266-275``), death is "any cell in row 0 after
  clearing" (``:277``) and overwrites the whole step reward with -100 (``:281``);
- on death no new piece spawns and the board is not cleared (``:283-299``);
- holes are recomputed only at lock time (``:278, :284``);
- the end-of-step emit sequence ``set_piece(True); copy; set_piece(False)``
  (``:301-303``) force-clears the piece cells from the persistent board, producing
  the spawn-overlap-erase and death-erase quirks — reproduced here by keeping the
  persistent board piece-erased (``rows_next = rows_after & ~piece_bits``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import EnvConfig, XSHIFT
from .pieces import ROWMASKS_FLAT, NROWS, DY_OFF
from .state import EnvState

_U32 = jnp.uint32
_I32 = jnp.int32
_F32 = jnp.float32

# NES line-clear score table (tetris_env.py:267).
_SCORES_TAB = np.array([0, 40, 100, 300, 1200], dtype=np.int32)

# Action ids (value_action_map, tetris_env.py:152-160).
A_LEFT, A_RIGHT, A_HARD, A_SOFT, A_ROTL, A_ROTR, A_IDLE = range(7)
NUM_ACTIONS = 7


class StepOut(NamedTuple):
    state: EnvState
    emitted_rows: jnp.ndarray  # uint32[B, H] board copy with active piece burned in
    reward: jnp.ndarray        # float32[B]
    done: jnp.ndarray          # bool[B]


# --------------------------------------------------------------------------- bits

def _not_valid(cfg: EnvConfig) -> jnp.ndarray:
    return _U32(~cfg.valid_mask & 0xFFFFFFFF)


def piece_masks(piece: jnp.ndarray, rot: jnp.ndarray, ax: jnp.ndarray) -> jnp.ndarray:
    """Absolute per-relative-row bitmasks for a piece at anchor column ``ax``.

    Returns uint32[..., NROWS]; relative row k covers board row ``ay + k - DY_OFF``;
    bit ``x + XSHIFT`` corresponds to column x. Stored table bits are ``dx + 3``
    and the absolute column is ``ax + dx``, so the shift is ``ax + (XSHIFT - 3)``.
    ``ax`` is guaranteed in [0, W) for reachable states (every piece contains its
    anchor cell, which is always collision-checked), keeping shifts non-negative;
    transient candidates at ax-1 = -1 still shift by >= 0 because XSHIFT-3 = 1.
    """
    tab = jnp.asarray(ROWMASKS_FLAT)                      # [28, NROWS] uint32
    rm = tab[piece * 4 + rot]                             # [..., NROWS]
    shift = (ax + (XSHIFT - 3)).astype(_U32)[..., None]
    return rm << shift


def pad_rows(rows: jnp.ndarray) -> jnp.ndarray:
    """Zero-pad H axis: 3 rows above the board, 4 below. Rows outside [0, H)
    read as empty, which is exactly what the collision rules need (y-bounds are
    handled arithmetically, not via board content)."""
    return jnp.pad(rows, ((0, 0), (DY_OFF, NROWS - DY_OFF)))


def _window(rows_pad: jnp.ndarray, ay: jnp.ndarray) -> jnp.ndarray:
    """rows at y = ay-3 .. ay+3 (zeros outside the board): uint32[B, NROWS].
    ``rows_pad[:, ay + k]`` holds board row ``ay + k - DY_OFF``."""
    return jax.vmap(
        lambda rp, a: jax.lax.dynamic_slice(rp, (a,), (NROWS,))
    )(rows_pad, ay)


def collide_window(cfg: EnvConfig, window: jnp.ndarray, masks: jnp.ndarray,
                   ay: jnp.ndarray) -> jnp.ndarray:
    """Collision test for C candidate piece masks sharing one anchor row.

    window: uint32[B, NROWS]; masks: uint32[B, C, NROWS]; ay: int32[B].
    Replicates ``is_occupied`` (tetris_env.py:29-36) per cell-row:
    skip if y < 0 (before any x check!); else collide on x out-of-board,
    y >= H (only if the row has cells), or board-bit overlap.
    """
    k = jnp.arange(NROWS, dtype=_I32)[None, :]            # [1, NROWS]
    y = ay[:, None] + (k - DY_OFF)                        # [B, NROWS]
    active = (y >= 0)[:, None, :]
    yo = (y >= cfg.height)[:, None, :]
    w = window[:, None, :]
    xo = (masks & _not_valid(cfg)) != 0
    nonempty = masks != 0
    hit = (w & masks) != 0
    return (active & (xo | (yo & nonempty) | hit)).any(axis=-1)  # [B, C]


def collide_profile(cfg: EnvConfig, rows_pad: jnp.ndarray,
                    masks: jnp.ndarray) -> jnp.ndarray:
    """Collision of one piece mask-set at *every* anchor row 0..H: bool[B, H+1].

    One dense pass subsumes soft-drop, gravity, hard-drop landing and the resting
    check for the post-action piece configuration. ``profile[:, H]`` is always True
    (the anchor cell at y = H is out of bounds), so drop distances are well defined.
    """
    H = cfg.height
    B = masks.shape[0]
    yprime = jnp.arange(H + 1, dtype=_I32)[None, :]        # [1, H+1]
    coll = jnp.zeros((B, H + 1), dtype=bool)
    nv = _not_valid(cfg)
    for k in range(NROWS):
        mk = masks[:, k:k + 1]                             # [B, 1]
        yk = yprime + (k - DY_OFF)                         # [1, H+1]
        nonempty = mk != 0
        xo = (mk & nv) != 0
        hit = (rows_pad[:, k:k + H + 1] & mk) != 0
        coll = coll | ((yk >= 0) & (xo | ((yk >= H) & nonempty) | hit))
    return coll


def _profile_at(coll: jnp.ndarray, ay: jnp.ndarray) -> jnp.ndarray:
    """coll[b, ay[b]] as bool[B]."""
    return jnp.take_along_axis(coll, ay[:, None], axis=1)[:, 0]


def place_bits(cfg: EnvConfig, masks: jnp.ndarray, ay: jnp.ndarray) -> jnp.ndarray:
    """Burn a piece into an empty board: uint32[B, H].

    Cells outside the board are silently dropped, matching the per-cell bounds
    check in ``_set_piece`` (tetris_env.py:323-327): x-out bits are stripped by
    the valid mask, y-out rows never match any board row index.
    """
    H = cfg.height
    valid = _U32(cfg.valid_mask)
    yrow = jnp.arange(H, dtype=_I32)[None, :]              # [1, H]
    pb = jnp.zeros((masks.shape[0], H), dtype=_U32)
    for k in range(NROWS):
        mk = (masks[:, k] & valid)[:, None]                # [B, 1]
        pb = pb | jnp.where(yrow == (ay[:, None] + (k - DY_OFF)), mk, _U32(0))
    return pb


# ----------------------------------------------------------------- board queries

def count_holes(cfg: EnvConfig, rows: jnp.ndarray) -> jnp.ndarray:
    """Empty cells with any filled cell above, as in
    ``count_nonzero(board.cumsum(y) * ~board)`` (tetris_env.py:218-220):
    popcount of ``~rows & prefixOR(rows)`` (the self-term cancels)."""
    above = jax.lax.associative_scan(jnp.bitwise_or, rows, axis=1)
    bits = jnp.bitwise_not(rows) & above & _U32(cfg.valid_mask)
    return jax.lax.population_count(bits).sum(axis=1).astype(_I32)


def nonempty_rows(cfg: EnvConfig, rows: jnp.ndarray) -> jnp.ndarray:
    """Count of rows with any filled cell — the reference's "height"
    (``sum(np.any(board, axis=0))``, tetris_env.py:287): with overhangs this is
    *not* the max column height; code is the spec."""
    return ((rows & _U32(cfg.valid_mask)) != 0).sum(axis=1).astype(_I32)


def clear_lines(cfg: EnvConfig, rows: jnp.ndarray):
    """Full-row removal with stable downward compaction (tetris_env.py:205-216).

    The reference walks rows bottom-up copying non-full rows down. Equivalently:
    a stable sort moving full rows to the top (then zeroing them) preserves the
    relative order of kept rows while shifting them down by the number of cleared
    rows above — identical result, expressed as argsort + gather (no scatter).
    """
    valid = _U32(cfg.valid_mask)
    full = (rows & valid) == valid                         # [B, H]
    # key 0 for full rows (sort to the top, then zeroed), 1 for kept rows
    order = jnp.argsort(jnp.where(full, 0, 1).astype(jnp.int8), axis=1, stable=True)
    permuted = jnp.take_along_axis(rows, order, axis=1)
    full_p = jnp.take_along_axis(full, order, axis=1)
    cleared = jnp.where(full_p, _U32(0), permuted)
    return cleared, full.sum(axis=1).astype(_I32)


# ------------------------------------------------------------------------ sampler

def sample_piece(counts: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Count-balanced piece choice (``_choose_shape``, tetris_env.py:183-191).

    weights m[i] = 5 + max(counts) - counts[i]; the reference draws
    r = randint(1, sum(m)) and walks linearly until the running total covers r.
    That is: piece = first index i with r <= cumsum(m)[i], i.e. the number of
    strict prefix sums below r.
    """
    maxm = counts.max(axis=1, keepdims=True)
    m = 5 + maxm - counts                                  # [B, 7]
    c = jnp.cumsum(m, axis=1)
    return (c < r[:, None]).sum(axis=1).astype(_I32)


def piece_weight_sum(counts: jnp.ndarray) -> jnp.ndarray:
    maxm = counts.max(axis=1, keepdims=True)
    return (5 + maxm - counts).sum(axis=1).astype(_I32)


def _split_keys(raw_keys: jnp.ndarray):
    """Advance per-env threefry chains: raw uint32[B,2] -> (carry, draw) keys."""
    typed = jax.random.wrap_key_data(raw_keys, impl="threefry2x32")
    pair = jax.vmap(lambda k: jax.random.split(k, 2))(typed)  # [B, 2] keys
    return jax.random.key_data(pair[:, 0]), pair[:, 1]


def draw_spawn_r(draw_keys, counts: jnp.ndarray) -> jnp.ndarray:
    """Pure-JAX analog of the reference's single RNG draw, randint(1, sum(m))
    (tetris_env.py:187): per-env threefry instead of the global Mersenne Twister.
    Parity mode bypasses this by injecting recorded reference draws."""
    s = piece_weight_sum(counts)
    return jax.vmap(
        lambda k, hi: jax.random.randint(k, (), 1, hi + 1, dtype=_I32)
    )(draw_keys, s)


# --------------------------------------------------------------------------- step

def engine_step(cfg: EnvConfig, state: EnvState, action: jnp.ndarray,
                injected_r: Optional[jnp.ndarray] = None) -> StepOut:
    """One batched transition; the order of operations tracks tetris_env.py:243-304.

    ``injected_r``: optional int32[B] of raw ``randint(1, sum(m))`` draws recorded
    from the reference, enabling bitwise trajectory parity. Ignored (may be any
    value) on steps where no spawn occurs.
    """
    H, W = cfg.height, cfg.width
    rows, piece, rot = state.rows, state.piece, state.rot
    ax, ay, lock = state.ax, state.ay, state.lock

    rows_pad = pad_rows(rows)

    # -- action: try left/right/rotate candidates at the current anchor row ------
    # (anchor int-coercion at :244 is implicit: anchors are stored as int32)
    win = _window(rows_pad, ay)
    m_l = piece_masks(piece, rot, ax - 1)
    m_r = piece_masks(piece, rot, ax + 1)
    m_rl = piece_masks(piece, (rot - 1) % 4, ax)
    m_rr = piece_masks(piece, (rot + 1) % 4, ax)
    cand = jnp.stack([m_l, m_r, m_rl, m_rr], axis=1)       # [B, 4, NROWS]
    c4 = collide_window(cfg, win, cand, ay)                # [B, 4]
    c_left, c_right, c_rotl, c_rotr = c4[:, 0], c4[:, 1], c4[:, 2], c4[:, 3]

    is_l = action == A_LEFT
    is_r = action == A_RIGHT
    is_h = action == A_HARD
    is_s = action == A_SOFT
    is_rl = action == A_ROTL
    is_rr = action == A_ROTR

    ax1 = ax + jnp.where(is_l & ~c_left, -1, 0) + jnp.where(is_r & ~c_right, 1, 0)
    rot1 = (rot + jnp.where(is_rl & ~c_rotl, -1, 0)
            + jnp.where(is_rr & ~c_rotr, 1, 0)) % 4

    # -- one dense collision profile at the post-action configuration -----------
    # (soft/hard/idle don't change rot/ax, so the profile also serves them)
    masks1 = piece_masks(piece, rot1, ax1)                 # [B, NROWS]
    coll = collide_profile(cfg, rows_pad, masks1)          # [B, H+1]

    c_soft = _profile_at(coll, ay + 1)
    idxs = jnp.arange(H + 1, dtype=_I32)[None, :]
    blocked = jnp.where((idxs > ay[:, None]) & coll, idxs, H + 2)
    ay_hard = blocked.min(axis=1) - 1                      # hard-drop landing row

    ay1 = jnp.where(is_h, ay_hard,
                    jnp.where(is_s & ~c_soft, ay + 1, ay))

    # -- gravity: one extra soft drop every step (:247) --------------------------
    g_coll = _profile_at(coll, ay1 + 1)
    ay2 = ay1 + jnp.where(g_coll, 0, 1)
    if cfg.step_reset:                                     # :248-249
        lock0 = jnp.where(ay2 != ay1, 0, lock)
    else:
        lock0 = lock
    time_next = state.time + 1                             # :253

    reward = jnp.full(ay.shape, 1.0 if cfg.reward_step else 0.0, _F32)  # :256

    # -- lock-delay FSM (:259-262) ----------------------------------------------
    resting = _profile_at(coll, ay2 + 1)                   # _has_dropped (:202)
    lock1 = jnp.where(resting, (lock0 + 1) % cfg.lock_modulus, lock0)
    locked = resting & (lock1 == 0)

    # -- lock: burn piece, clear lines, score, death, penalties, spawn ----------
    pb_lock = place_bits(cfg, masks1, ay2)
    rows_locked = rows | jnp.where(locked[:, None], pb_lock, _U32(0))
    rows_cleared, n_clear = clear_lines(cfg, rows_locked)
    n_clear = jnp.where(locked, n_clear, 0)
    rows_after = jnp.where(locked[:, None], rows_cleared, rows)
    lines_next = state.lines_cleared + n_clear

    if cfg.advanced_clears:                                # :266-269
        sc = jnp.take(jnp.asarray(_SCORES_TAB), n_clear)
        reward = reward + 2.5 * sc.astype(_F32)
        score_inc = sc
    elif cfg.high_scoring:                                 # :270-272
        reward = reward + 1000.0 * n_clear.astype(_F32)
        score_inc = n_clear
    else:                                                  # :273-275
        reward = reward + 100.0 * n_clear.astype(_F32)
        score_inc = n_clear
    score_next = state.score + jnp.where(locked, score_inc, 0)

    death = locked & ((rows_after[:, 0] & _U32(cfg.valid_mask)) != 0)  # :277
    alive_lock = locked & ~death

    old_holes = state.holes
    holes_new = count_holes(cfg, rows_after)
    holes_next = jnp.where(locked, holes_new, old_holes)   # recomputed only at lock

    piece_height_next = state.piece_height
    if cfg.penalise_height:                                # :286-287
        reward = reward - jnp.where(alive_lock,
                                    nonempty_rows(cfg, rows_after), 0).astype(_F32)
    elif cfg.penalise_height_increase:                     # :288-292
        nh = nonempty_rows(cfg, rows_after)
        inc = nh - state.piece_height
        reward = reward - jnp.where(alive_lock & (inc > 0), 10 * inc, 0).astype(_F32)
        piece_height_next = jnp.where(alive_lock, nh, state.piece_height)
    if cfg.penalise_holes:                                 # :294-295
        reward = reward - jnp.where(alive_lock, 5 * holes_new, 0).astype(_F32)
    elif cfg.penalise_holes_increase:                      # :296-297
        reward = reward - jnp.where(alive_lock,
                                    5 * (holes_new - old_holes), 0).astype(_F32)

    # death overwrites everything accumulated this step (:281)
    reward = jnp.where(death, _F32(-100.0), reward)
    deaths_next = state.deaths + death.astype(_I32)

    # -- spawn (only on alive lock; no spawn on death, :283-299) ----------------
    carry_keys, draw_keys = _split_keys(state.key)
    if injected_r is None:
        r_draw = draw_spawn_r(draw_keys, state.shape_counts)
    else:
        r_draw = injected_r.astype(_I32)
    piece_new = sample_piece(state.shape_counts, r_draw)
    piece_next = jnp.where(alive_lock, piece_new, piece)
    rot_next = jnp.where(alive_lock, 0, rot1)
    ax_next = jnp.where(alive_lock, cfg.spawn_x, ax1)
    ay_next = jnp.where(alive_lock, 0, ay2)
    counts_next = state.shape_counts + jnp.where(
        alive_lock[:, None],
        jax.nn.one_hot(piece_new, 7, dtype=_I32), 0)

    # -- emit: burn piece, copy, erase (:301-303) — including the erase quirks --
    m_emit = piece_masks(piece_next, rot_next, ax_next)
    pb_emit = place_bits(cfg, m_emit, ay_next)
    emitted = rows_after | pb_emit
    rows_next = rows_after & jnp.bitwise_not(pb_emit)

    new_state = state.replace(
        rows=rows_next, piece=piece_next, rot=rot_next,
        ax=ax_next, ay=ay_next, lock=lock1,
        time=time_next, score=score_next, holes=holes_next,
        lines_cleared=lines_next, piece_height=piece_height_next,
        deaths=deaths_next, shape_counts=counts_next, key=carry_keys,
    )
    return StepOut(new_state, emitted, reward, death)


def engine_clear(cfg: EnvConfig, state: EnvState,
                 injected_r: Optional[jnp.ndarray] = None):
    """Episode reset (``TetrisEngine.clear``, tetris_env.py:306-315): zero the
    board and per-episode counters, spawn a piece — but carry over ``_lock_delay``,
    ``n_deaths`` and ``shape_counts`` (they are deliberately *not* reset there).
    Returns (state, emitted_rows): the reference returns the *zeroed board without
    the spawned piece burned in* (:313-315), so the reset observation is empty.
    """
    zeros_i = jnp.zeros_like(state.time)
    carry_keys, draw_keys = _split_keys(state.key)
    if injected_r is None:
        r_draw = draw_spawn_r(draw_keys, state.shape_counts)
    else:
        r_draw = injected_r.astype(_I32)
    piece_new = sample_piece(state.shape_counts, r_draw)
    counts_next = state.shape_counts + jax.nn.one_hot(piece_new, 7, dtype=_I32)
    rows0 = jnp.zeros_like(state.rows)
    new_state = state.replace(
        rows=rows0, piece=piece_new,
        rot=zeros_i, ax=jnp.full_like(state.ax, cfg.spawn_x), ay=zeros_i,
        time=zeros_i, score=zeros_i, holes=zeros_i,
        lines_cleared=zeros_i, piece_height=zeros_i,
        shape_counts=counts_next, key=carry_keys,
        # lock, deaths intentionally carried over
    )
    return new_state, rows0


def render_rows(cfg: EnvConfig, state: EnvState) -> jnp.ndarray:
    """Board copy with the active piece burned in (``TetrisEngine.render``,
    tetris_env.py:317-321). Note: ``rows`` is invariantly piece-erased, so this is
    a pure OR (no unburn side effect to replicate)."""
    m = piece_masks(state.piece, state.rot, state.ax)
    return state.rows | place_bits(cfg, m, state.ay)


def valid_action_count(cfg: EnvConfig, state: EnvState) -> jnp.ndarray:
    """Number of actions that would change (shape, anchor)
    (``valid_action_count``, tetris_env.py:222-230): idle never counts; rotations
    count when unobstructed (a rotated offset-list never compares equal to the
    original); soft_drop and hard_drop each count iff one soft drop is possible.
    """
    rows_pad = pad_rows(state.rows)
    win = _window(rows_pad, state.ay)
    cand = jnp.stack([
        piece_masks(state.piece, state.rot, state.ax - 1),
        piece_masks(state.piece, state.rot, state.ax + 1),
        piece_masks(state.piece, (state.rot - 1) % 4, state.ax),
        piece_masks(state.piece, (state.rot + 1) % 4, state.ax),
    ], axis=1)
    c4 = collide_window(cfg, win, cand, state.ay)
    m_cur = piece_masks(state.piece, state.rot, state.ax)
    win_dn = _window(rows_pad, state.ay + 1)
    c_soft = collide_window(cfg, win_dn, m_cur[:, None, :], state.ay + 1)[:, 0]
    return ((~c4).sum(axis=1) + 2 * (~c_soft).astype(_I32)).astype(_I32)
