"""On-device replay ring buffer, with optional prioritization.

The reference has no training infrastructure at all (SURVEY.md §3.5: its README
loop is a random policy). This buffer is designed for the on-device actor-
learner: transitions never leave HBM, inserts are contiguous
``dynamic_update_slice`` blocks (the env batch writes one block per step; the
capacity is a multiple of the insert width, so the ring pointer stays aligned
and no scatter is ever generated on insert), and sampling is a batched row
gather.

Observations are stored as uint8 (the env palette fits: ram is 0/1, images are
{0,128,190}) — 4x less HBM than float32; the learner casts on the way in.

Transitions carry a ``discount`` = gamma^m * (1 - done) so the TD target is
always ``reward + discount * Q(next_obs)`` — one formula for 1-step and n-step
returns (train/dqn.py builds n-step rewards in a rolling window).

Prioritized replay (Schaul et al. 2015) is TPU-reshaped: instead of a
host-side sum-tree, sampling-proportional-to-priority uses the
**Gumbel-top-k** trick — ``top_k(log p + Gumbel noise)`` draws a batch without
replacement from the Plackett-Luce distribution over priorities in one fused
device op. Priority writes are a single scatter in the learner (the
no-scatter rule is for the env step path, core/engine.py, not the learner).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ReplayState:
    obs: jnp.ndarray       # uint8[cap, *obs_shape]
    next_obs: jnp.ndarray  # uint8[cap, *obs_shape]
    action: jnp.ndarray    # int8[cap]
    reward: jnp.ndarray    # float32[cap] — n-step return when n > 1
    discount: jnp.ndarray  # float32[cap] — gamma^m * (1 - done)
    done: jnp.ndarray      # bool[cap]
    priority: jnp.ndarray  # float32[cap] — p^alpha, 0 for empty rows
    max_p: jnp.ndarray     # float32[] — running max priority (new inserts)
    ptr: jnp.ndarray       # int32[] — next insert offset (multiple of width)
    filled: jnp.ndarray    # int32[] — number of valid rows

    @property
    def capacity(self) -> int:
        return self.obs.shape[0]


def replay_init(capacity: int, obs_shape: Tuple[int, ...],
                insert_width: int) -> ReplayState:
    if capacity % insert_width:
        raise ValueError(
            f"capacity {capacity} must be a multiple of the env batch "
            f"{insert_width} (keeps inserts contiguous, scatter-free)")
    z = jnp.zeros
    return ReplayState(
        obs=z((capacity,) + tuple(obs_shape), jnp.uint8),
        next_obs=z((capacity,) + tuple(obs_shape), jnp.uint8),
        action=z((capacity,), jnp.int8),
        reward=z((capacity,), jnp.float32),
        discount=z((capacity,), jnp.float32),
        done=z((capacity,), jnp.bool_),
        priority=z((capacity,), jnp.float32),
        max_p=jnp.ones((), jnp.float32),
        ptr=jnp.zeros((), jnp.int32),
        filled=jnp.zeros((), jnp.int32),
    )


def replay_insert(rs: ReplayState, obs, next_obs, action, reward, done,
                  discount=None, *, gamma: float = None) -> ReplayState:
    """Insert one env-batch block of B transitions at the ring pointer.

    Exactly one of ``discount`` (precomputed, e.g. n-step gamma^n*(1-done))
    or ``gamma`` (the 1-step ``gamma * (1 - done)`` is derived) must be given
    — there is deliberately no default discount rate to silently mismatch the
    learner's. New rows get the running max priority (standard PER bootstrap;
    harmless when sampling uniformly).
    """
    b = obs.shape[0]
    if (discount is None) == (gamma is None):
        raise TypeError("pass exactly one of discount= or gamma=")
    if discount is None:
        discount = gamma * (1.0 - done.astype(jnp.float32))
    start = (rs.ptr,) + (0,) * (obs.ndim - 1)

    def upd(buf, val):
        return jax.lax.dynamic_update_slice(buf, val, start[: val.ndim])

    return rs.replace(
        obs=upd(rs.obs, obs.astype(jnp.uint8)),
        next_obs=upd(rs.next_obs, next_obs.astype(jnp.uint8)),
        action=upd(rs.action, action.astype(jnp.int8)),
        reward=upd(rs.reward, reward.astype(jnp.float32)),
        discount=upd(rs.discount, discount.astype(jnp.float32)),
        done=upd(rs.done, done),
        priority=upd(rs.priority, jnp.full((b,), rs.max_p, jnp.float32)),
        ptr=(rs.ptr + b) % rs.capacity,
        filled=jnp.minimum(rs.filled + b, rs.capacity),
    )


def _gather_batch(rs: ReplayState, idx: jnp.ndarray) -> dict:
    take = lambda buf: jnp.take(buf, idx, axis=0)
    return {
        "obs": take(rs.obs).astype(jnp.float32),
        "next_obs": take(rs.next_obs).astype(jnp.float32),
        "action": take(rs.action).astype(jnp.int32),
        "reward": take(rs.reward),
        "discount": take(rs.discount),
        "done": take(rs.done),
    }


def replay_sample(rs: ReplayState, key, batch: int) -> dict:
    """Uniform sample of ``batch`` transitions from the filled region."""
    idx = jax.random.randint(key, (batch,), 0, jnp.maximum(rs.filled, 1))
    return _gather_batch(rs, idx)


def replay_sample_prioritized(rs: ReplayState, key, batch: int, beta):
    """Priority-proportional sample without replacement (Gumbel-top-k).

    Returns (batch_dict, idx, weights): importance weights
    ``(1 / (N * P(i)))^beta`` normalized by their max (Schaul et al. eq. 1-2).
    """
    cap = rs.capacity
    valid = jnp.arange(cap) < rs.filled
    p = jnp.where(valid, rs.priority, 0.0)
    sum_p = jnp.maximum(p.sum(), 1e-12)
    logits = jnp.where(valid, jnp.log(jnp.maximum(p, 1e-12)), -jnp.inf)
    g = jax.random.gumbel(key, (cap,))
    _, idx = jax.lax.top_k(logits + g, batch)
    out = _gather_batch(rs, idx)
    prob = jnp.take(p, idx) / sum_p                       # P(i)
    n = jnp.maximum(rs.filled, 1).astype(jnp.float32)
    w = (1.0 / (n * jnp.maximum(prob, 1e-12))) ** beta
    # rows beyond the filled region (batch > filled during warmup) have
    # P(i)=0: zero their weight BEFORE normalizing, or their huge 1/P weight
    # would both train on garbage and collapse real rows' weights to ~0
    w = jnp.where(prob > 0, w, 0.0)
    w = w / jnp.maximum(w.max(), 1e-12)
    return out, idx, w


def replay_update_priority(rs: ReplayState, idx, td_abs, alpha: float,
                           eps: float = 1e-3) -> ReplayState:
    """Write back p = (|delta| + eps)^alpha at the sampled rows."""
    p = (jnp.abs(td_abs) + eps) ** alpha
    return rs.replace(
        priority=rs.priority.at[idx].set(p.astype(jnp.float32)),
        max_p=jnp.maximum(rs.max_p, p.max()),
    )
