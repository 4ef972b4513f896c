"""CI-size render-geometry fuzz: every step's rendered image at the 160px
(rgb_array) and 512px (human window) sizes vs the host raster of the C++
oracle's boards.

This is the in-suite twin of ``tools/soak_fuzz.py --pixels --pixel-size
160/512`` (VERDICT r4 #7: the non-84 render paths were pixel-parity-tested
against the reference at fixed boards, test_raster.py, but never fuzzed at
soak style against the oracle). Geometry per reference
``tetris_env.py:446`` (rgb_array 160) and ``:460`` (human 512); the 84px
observation path has its own CI fuzz via the --pixels soak families and
test_parity_obs.py.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gym_simpletetris_tpu import EnvConfig
from gym_simpletetris_tpu.core import engine as E
from gym_simpletetris_tpu.core.state import init_state
from gym_simpletetris_tpu.api.env import _select_done
from gym_simpletetris_tpu.ops.bitops import unpack_rows
from gym_simpletetris_tpu.ops.raster import rasterize, rasterize_host_batch
from gym_simpletetris_tpu.native import drive_many

FLAG_KEYS = ("lock_delay", "step_reset", "reward_step", "penalise_height",
             "penalise_height_increase", "advanced_clears", "high_scoring",
             "penalise_holes", "penalise_holes_increase")

# (config, pixel size, B, T): one standard board per size, plus a
# multi-word wide board (W>24) at each size — the soak tool's two
# previously-uncovered families, CI-sized.
CASES = [
    (EnvConfig(width=10, height=20, lock_delay=2, step_reset=True), 160, 16, 96),
    (EnvConfig(width=33, height=14, advanced_clears=True), 160, 16, 96),
    (EnvConfig(width=10, height=20, high_scoring=True), 512, 8, 48),
    (EnvConfig(width=40, height=26, lock_delay=1), 512, 8, 48),
]


@pytest.mark.parametrize("ci", range(len(CASES)))
def test_render_fuzz_vs_oracle(ci):
    cfg, size, B, T = CASES[ci]
    rng = np.random.RandomState(9000 + ci)
    # drop-heavy script: a lock every ~2 steps maximizes board churn
    actions = np.asarray([0, 1, 2, 2, 2, 4, 5], np.int32)[
        rng.randint(0, 7, size=(T, B))]
    out = drive_many(actions.T,
                     rng.randint(1, 1 << 31, B).astype(np.uint64),
                     width=cfg.width, height=cfg.height,
                     **{k: getattr(cfg, k) for k in FLAG_KEYS})

    state = init_state(cfg, B, jax.random.PRNGKey(ci))
    state, _ = jax.jit(lambda s, r: E.engine_clear(cfg, s, injected_r=r))(
        state, jnp.asarray(out["r0"]))

    def body(st, xs):
        a, rs, rc = xs
        o = E.engine_step(cfg, st, a, injected_r=rs)
        cleared, _ = E.engine_clear(cfg, o.state, injected_r=rc)
        return _select_done(o.done, cleared, o.state), o.emitted_rows

    xs = (jnp.asarray(actions), jnp.asarray(out["r_step"].T),
          jnp.asarray(out["r_clear"].T))
    _, em = jax.jit(lambda s, x: jax.lax.scan(body, s, x))(state, xs)

    # em: [T, ...packed rows (batch-minor)...]; unpack_rows -> [B, H, W],
    # rasterize is batched over its leading axis -> imgs [T, B, size, size]
    imgs = np.asarray(jax.jit(jax.vmap(
        lambda e: rasterize(unpack_rows(cfg, e, dtype=jnp.uint8),
                            cfg.height, cfg.width, size)))(em))
    want = rasterize_host_batch(
        np.transpose(out["boards"], (1, 0, 3, 2)).reshape(
            -1, cfg.height, cfg.width),
        cfg.height, cfg.width, size).reshape(imgs.shape)
    np.testing.assert_array_equal(imgs, want, err_msg=f"cfg={cfg} size={size}")
