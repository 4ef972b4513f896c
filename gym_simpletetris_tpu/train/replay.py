"""On-device replay ring buffer.

The reference has no training infrastructure at all (SURVEY.md §3.5: its README
loop is a random policy). This buffer is designed for the on-device actor-
learner: transitions never leave HBM, inserts are contiguous
``dynamic_update_slice`` blocks (the env batch writes one block per step; the
capacity is a multiple of the insert width, so the ring pointer stays aligned
and no scatter is ever generated), and sampling is a batched row gather.

Observations are stored as uint8 (the env palette fits: ram is 0/1, images are
{0,128,190}) — 4x less HBM than float32; the learner casts on the way in.
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
    reward: jnp.ndarray    # float32[cap]
    done: jnp.ndarray      # bool[cap]
    ptr: jnp.ndarray       # int32[] — next insert offset (multiple of insert width)
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
        done=z((capacity,), jnp.bool_),
        ptr=jnp.zeros((), jnp.int32),
        filled=jnp.zeros((), jnp.int32),
    )


def replay_insert(rs: ReplayState, obs, next_obs, action, reward,
                  done) -> ReplayState:
    """Insert one env-batch block of B transitions at the ring pointer."""
    b = obs.shape[0]
    start = (rs.ptr,) + (0,) * (obs.ndim - 1)

    def upd(buf, val):
        return jax.lax.dynamic_update_slice(
            buf, val, start[: val.ndim])

    return rs.replace(
        obs=upd(rs.obs, obs.astype(jnp.uint8)),
        next_obs=upd(rs.next_obs, next_obs.astype(jnp.uint8)),
        action=upd(rs.action, action.astype(jnp.int8)),
        reward=upd(rs.reward, reward.astype(jnp.float32)),
        done=upd(rs.done, done),
        ptr=(rs.ptr + b) % rs.capacity,
        filled=jnp.minimum(rs.filled + b, rs.capacity),
    )


def replay_sample(rs: ReplayState, key, batch: int):
    """Uniform sample of ``batch`` transitions from the filled region."""
    idx = jax.random.randint(key, (batch,), 0, jnp.maximum(rs.filled, 1))
    take = lambda buf: jnp.take(buf, idx, axis=0)
    return {
        "obs": take(rs.obs).astype(jnp.float32),
        "next_obs": take(rs.next_obs).astype(jnp.float32),
        "action": take(rs.action).astype(jnp.int32),
        "reward": take(rs.reward),
        "done": take(rs.done),
    }
