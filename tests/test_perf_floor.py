"""Throughput-floor tests (SURVEY.md §4.5) and sampler statistics.

The floor test only runs on real TPU (the CI suite forces CPU where absolute
floors are meaningless); the driver's bench run provides the headline number.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_simpletetris_tpu import EnvConfig, TetrisVectorEnv
from gym_simpletetris_tpu.core import engine as E
from gym_simpletetris_tpu.core.state import init_state


def test_piece_sampler_is_count_balancing():
    """The threefry sampler must reproduce the reference's count-balanced
    distribution: weights 5 + max(counts) - counts (tetris_env.py:183-191).
    With skewed counts, the starved piece must be drawn ~max_weight/sum more
    often than the saturated one."""
    counts = jnp.asarray(
        np.array([[20, 0, 10, 10, 10, 10, 10]], np.int32).T)  # [7, 1]
    counts = jnp.tile(counts, (1, 20000))                     # [7, B]
    key = jax.random.wrap_key_data(jnp.array([1, 2], jnp.uint32))
    r = E.draw_spawn_r(key, counts)
    pieces = np.asarray(E.sample_piece(counts, r))
    freq = np.bincount(pieces, minlength=7) / pieces.size
    m = np.array([5, 25, 15, 15, 15, 15, 15], float)
    expect = m / m.sum()
    np.testing.assert_allclose(freq, expect, atol=0.01)


@pytest.mark.skipif("cpu" in jax.devices()[0].platform.lower(),
                    reason="absolute throughput floors only meaningful on TPU")
def test_tpu_throughput_floor():
    import time
    env = TetrisVectorEnv(EnvConfig(auto_reset=True), 4096)
    _, state = env.reset(jax.random.PRNGKey(0))
    acts = jax.random.randint(jax.random.PRNGKey(1), (1024, 4096), 0, 7)
    out = env.rollout(state, acts)
    np.asarray(out[2].sum())
    # time 4 chained chunks with one final fetch: the remote backend's
    # ~45 ms dispatch/fetch latency would dominate a single short call
    t0 = time.time()
    for _ in range(4):
        out = env.rollout(out[0], acts)
    np.asarray(out[2].sum())
    sps = 4 * 1024 * 4096 / (time.time() - t0)
    # measured capability is ~144M (BENCH_LOCAL.md); 20M leaves 7x margin for
    # noisy neighbors/cold paths while still catching order-of-magnitude
    # regressions (and stays above the 10M north star)
    assert sps > 20_000_000, f"ram throughput regressed: {sps:,.0f} steps/s"


@pytest.mark.skipif("cpu" in jax.devices()[0].platform.lower(),
                    reason="absolute throughput floors only meaningful on TPU")
def test_tpu_image_throughput_floor():
    """Image-observation floor (measured ~35M with the sep raster; 10M floor
    = the BASELINE north star, with 3.5x margin for noisy neighbors)."""
    import time
    env = TetrisVectorEnv(EnvConfig(obs_type="grayscale", auto_reset=True),
                          4096)
    _, state = env.reset(jax.random.PRNGKey(0))
    acts = jax.random.randint(jax.random.PRNGKey(1), (1024, 4096), 0, 7)
    out = env.rollout(state, acts)
    np.asarray(out[2].sum())
    t0 = time.time()
    for _ in range(4):
        out = env.rollout(out[0], acts)
    np.asarray(out[2].sum())
    sps = 4 * 1024 * 4096 / (time.time() - t0)
    assert sps > 10_000_000, f"image throughput regressed: {sps:,.0f} steps/s"


@pytest.mark.skipif("cpu" in jax.devices()[0].platform.lower(),
                    reason="absolute throughput floors only meaningful on TPU")
def test_tpu_wide_board_throughput_floor():
    """Perf canary for the multi-word (W>24) funnel-shift path (round-5
    verdict item 6): ram rollout at W=32, B=4096 measured 46.3M env-steps/s
    (0.34x the single-word W=10 headline — the ~Nw x bit-op cost, .jobs/42
    round 5). An accidental gather/layout regression in the wide path is a
    20-100x class; the floor sits far above it and safely below the record."""
    import time
    env = TetrisVectorEnv(EnvConfig(width=32, height=20, auto_reset=True),
                          4096)
    _, state = env.reset(jax.random.PRNGKey(0))
    acts = jax.random.randint(jax.random.PRNGKey(1), (1024, 4096), 0, 7)
    for _ in range(2):
        fs, acc, rew, done = env.rollout(state, acts)
    np.asarray(rew[-1, :1])
    t0 = time.perf_counter()
    for _ in range(4):
        state, acc, rew, done = env.rollout(state, acts)
    np.asarray(rew[-1, :1])
    sps = 4 * 1024 * 4096 / (time.perf_counter() - t0)
    assert sps > 25e6, f"wide-board W=32 rollout at {sps/1e6:.1f}M < 25M floor"
