"""PPO trainer and heuristic-policy tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_simpletetris_tpu import EnvConfig, TetrisVectorEnv
from gym_simpletetris_tpu.models.heuristic import (
    HeuristicWeights, make_heuristic_policy)
from gym_simpletetris_tpu.train.ppo import PPOConfig, make_ppo


def test_ppo_update_runs_and_learns():
    cfg = PPOConfig(
        env=EnvConfig(obs_type="ram", auto_reset=True, reward_step=True,
                      width=6, height=8),
        num_envs=16, rollout_len=16, num_minibatches=4, epochs=2)
    init_fn, update_fn, _ = make_ppo(cfg)
    state = init_fn(jax.random.PRNGKey(0))
    upd = jax.jit(update_fn)
    p0 = state.params
    for _ in range(3):
        state, metrics = upd(state)
    assert int(state.update) == 3
    for k in ("pg_loss", "v_loss", "entropy", "clip_frac", "mean_reward"):
        assert np.isfinite(float(metrics[k])), k
    diff = sum(float(jnp.abs(a - b).sum())
               for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(state.params)))
    assert diff > 0
    # entropy of a 7-action categorical starts near log(7)
    assert 0.0 < float(metrics["entropy"]) <= np.log(7) + 1e-3


def test_ppo_conv_variant_compiles():
    cfg = PPOConfig(
        env=EnvConfig(obs_type="grayscale", auto_reset=True, width=6, height=8),
        num_envs=4, rollout_len=8, num_minibatches=2, epochs=1)
    init_fn, update_fn, _ = make_ppo(cfg)
    state = init_fn(jax.random.PRNGKey(1))
    state, metrics = jax.jit(update_fn)(state)
    assert np.isfinite(float(metrics["pg_loss"]))


def test_ppo_requires_auto_reset():
    with pytest.raises(ValueError):
        make_ppo(PPOConfig(env=EnvConfig(auto_reset=False)))


def test_heuristic_policy_beats_random():
    cfg = EnvConfig(width=8, height=10, auto_reset=True, reward_step=True)
    env = TetrisVectorEnv(cfg, 32)
    policy = make_heuristic_policy(cfg)

    def run(use_policy, seed, steps=300):
        obs, state = env.reset(jax.random.PRNGKey(seed))
        rng = np.random.RandomState(seed)
        deaths0 = int(state.deaths.sum())
        for t in range(steps):
            if use_policy:
                a = policy(state)
            else:
                a = jnp.asarray(rng.randint(0, 7, 32))
            obs, state, r, d, _ = env.step(state, a)
        return int(state.deaths.sum()) - deaths0, int(state.lines_cleared.sum())

    h_deaths, h_lines = run(True, 0)
    r_deaths, r_lines = run(False, 1)
    # the lookahead policy must die substantially less often than random
    assert h_deaths < r_deaths, (h_deaths, r_deaths)


def test_heuristic_policy_shape_and_determinism():
    cfg = EnvConfig(auto_reset=True)
    env = TetrisVectorEnv(cfg, 8)
    obs, state = env.reset(jax.random.PRNGKey(2))
    policy = make_heuristic_policy(cfg, HeuristicWeights(holes=10.0))
    a1 = policy(state)
    a2 = policy(state)
    assert a1.shape == (8,) and a1.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert int(a1.min()) >= 0 and int(a1.max()) < 7
