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
