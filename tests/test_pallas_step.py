"""Fused Pallas step kernel == XLA engine step, bit-for-bit (interpret mode on
the CPU test backend; the real-TPU equivalence is exercised by the bench
harness and dev drives)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_simpletetris_tpu import EnvConfig
from gym_simpletetris_tpu.core import engine as E
from gym_simpletetris_tpu.core.state import init_state
from gym_simpletetris_tpu.ops.pallas_step import engine_step_pallas


def _assert_state_equal(a, b, t):
    for name in ("rows", "piece", "rot", "ax", "ay", "lock", "time", "score",
                 "holes", "lines_cleared", "piece_height", "deaths",
                 "shape_counts"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
            err_msg=f"state.{name} t={t}")


@pytest.mark.parametrize("flags", [
    dict(),
    dict(reward_step=True, advanced_clears=True, penalise_height=True,
         penalise_holes=True),
    dict(high_scoring=True, penalise_height_increase=True,
         penalise_holes_increase=True, lock_delay=2, step_reset=True),
])
def test_pallas_step_matches_xla(flags):
    cfg = EnvConfig(width=10, height=20, **flags)
    B = 8
    key = jax.random.PRNGKey(0)
    s_x = init_state(cfg, B, key)
    s_x, _ = E.engine_clear(cfg, s_x, injected_r=jnp.full((B,), 3, jnp.int32))
    s_p = s_x
    rng = np.random.RandomState(1)
    for t in range(60):
        a = jnp.asarray(rng.randint(0, 7, B))
        r = jnp.asarray(rng.randint(1, 36, B))
        out_x = E.engine_step(cfg, s_x, a, injected_r=r)
        out_p = engine_step_pallas(cfg, s_p, a, injected_r=r,
                                   block_b=B, interpret=True)
        _assert_state_equal(out_x.state, out_p.state, t)
        np.testing.assert_array_equal(np.asarray(out_x.emitted_rows),
                                      np.asarray(out_p.emitted_rows), err_msg=f"t={t}")
        np.testing.assert_array_equal(np.asarray(out_x.reward),
                                      np.asarray(out_p.reward), err_msg=f"t={t}")
        np.testing.assert_array_equal(np.asarray(out_x.done),
                                      np.asarray(out_p.done), err_msg=f"t={t}")
        s_x, s_p = out_x.state, out_p.state


def test_pallas_step_drawn_rng_matches_xla():
    """With the internal threefry draw (no injection) both paths must still
    agree — the draw happens outside the kernel from the same key."""
    cfg = EnvConfig(width=6, height=8)
    B = 4
    s = init_state(cfg, B, jax.random.PRNGKey(2))
    s, _ = E.engine_clear(cfg, s)
    s_x = s_p = s
    for t in range(40):
        a = jnp.full((B,), 2, jnp.int32)  # hard drop: spawns often
        out_x = E.engine_step(cfg, s_x, a)
        out_p = engine_step_pallas(cfg, s_p, a, block_b=B, interpret=True)
        _assert_state_equal(out_x.state, out_p.state, t)
        np.testing.assert_array_equal(np.asarray(out_x.state.key),
                                      np.asarray(out_p.state.key))
        s_x, s_p = out_x.state, out_p.state


def test_pallas_batch_divisibility():
    cfg = EnvConfig()
    s = init_state(cfg, 6, jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        engine_step_pallas(cfg, s, jnp.zeros(6, jnp.int32), block_b=4,
                           interpret=True)
