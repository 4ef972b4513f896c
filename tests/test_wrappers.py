"""FrameStack and EpisodeStats wrapper tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_simpletetris_tpu import EnvConfig, TetrisVectorEnv
from gym_simpletetris_tpu.api.wrappers import EpisodeStats, FrameStack


def test_frame_stack_shapes_and_shift():
    env = TetrisVectorEnv(EnvConfig(obs_type="grayscale", auto_reset=True), 2)
    fs = FrameStack(env, k=4)
    obs, state = fs.reset(jax.random.PRNGKey(0))
    assert obs.shape == (2, 84, 84, 4)
    # all stacked frames identical at reset
    assert np.asarray(jnp.abs(obs[..., 0] - obs[..., 3]).max()) == 0
    obs1, state, r, d, _ = fs.step(state, jnp.zeros(2, jnp.int32))
    # the previous newest frame became frame index 2
    np.testing.assert_array_equal(np.asarray(obs[..., 3]),
                                  np.asarray(obs1[..., 2]))


def test_episode_stats_accumulates():
    env = TetrisVectorEnv(
        EnvConfig(width=4, height=5, auto_reset=True, reward_step=True), 8)
    es = EpisodeStats(env)
    obs, state = es.reset(jax.random.PRNGKey(1))
    rng = np.random.RandomState(0)
    total_eps = 0
    for t in range(60):
        obs, state, r, d, info = es.step(state, jnp.asarray(rng.randint(0, 7, 8)))
        total_eps += int(d.sum())
    assert int(state.episodes.sum()) == total_eps
    assert total_eps > 0
    # a finished episode's recorded length is positive
    i = int(np.argmax(np.asarray(state.episodes)))
    assert int(state.last_length[i]) > 0


def test_episode_stats_requires_auto_reset():
    env = TetrisVectorEnv(EnvConfig(auto_reset=False), 2)
    with pytest.raises(ValueError):
        EpisodeStats(env)


def test_episode_stats_counts_lines_across_resets():
    """total_lines accumulates info["lines_delta"] across auto-resets (the
    env_state per-episode counter is zeroed by the reset mask,
    tetris_env.py:307-311, so a state-based sum would undercount)."""
    env = TetrisVectorEnv(
        EnvConfig(width=4, height=5, auto_reset=True), 16)
    es = EpisodeStats(env)
    obs, state = es.reset(jax.random.PRNGKey(3))
    rng = np.random.RandomState(3)
    manual = np.zeros(16, np.int64)
    for t in range(300):
        a = jnp.asarray(rng.randint(0, 7, 16))
        obs, state, r, d, info = es.step(state, a)
        delta = np.asarray(info["lines_delta"])
        assert (delta >= 0).all()
        manual += delta
    np.testing.assert_array_equal(np.asarray(state.total_lines), manual)
    # narrow board + random hard drops clear lines within 300 steps; the
    # accumulated total must exceed the in-progress-episode counter alone
    assert manual.sum() > 0
    assert manual.sum() >= int(np.asarray(state.env_state.lines_cleared).sum())
