"""Distributional DQN (C51) tests: projection math, head shapes, training.

The reference ships no model code at all (SURVEY.md §2.6); C51 is part of the
framework's bundled model family (models/dqn.py C51Head, train/dqn.py
``DQNConfig.distributional``). The projection is checked against a brute-force
per-atom numpy implementation of Bellemare et al. 2017 algorithm 1.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_simpletetris_tpu import EnvConfig
from gym_simpletetris_tpu.models.dqn import build_q_network, C51Head
from gym_simpletetris_tpu.train.dqn import (DQNConfig, make_train,
                                            project_distribution)


def _project_ref(probs, tz, v_min, v_max, n):
    """Per-atom scalar reference of the categorical projection."""
    dz = (v_max - v_min) / (n - 1)
    out = np.zeros_like(probs)
    for i in range(probs.shape[0]):
        for j in range(n):
            t = min(max(tz[i, j], v_min), v_max)
            b = (t - v_min) / dz
            lo, up = int(np.floor(b)), int(np.ceil(b))
            if lo == up:                       # integral b: all mass to lo
                out[i, lo] += probs[i, j]
            else:
                out[i, lo] += probs[i, j] * (up - b)
                out[i, up] += probs[i, j] * (b - lo)
    return out


@pytest.mark.parametrize("v_min,v_max,n", [(-110.0, 110.0, 51),
                                           (-10.0, 10.0, 21)])
def test_projection_matches_bruteforce(v_min, v_max, n):
    rng = np.random.RandomState(0)
    logits = rng.randn(32, n).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    z = np.linspace(v_min, v_max, n, dtype=np.float32)
    # rewards incl. the -100 death overwrite, discounts incl. 0 (done)
    reward = rng.choice([0.0, 1.0, -5.0, -100.0, 250.0], size=(32, 1))
    disc = rng.choice([0.0, 0.99, 0.99 ** 3], size=(32, 1))
    tz = (reward + disc * z[None, :]).astype(np.float32)

    got = np.asarray(project_distribution(jnp.asarray(probs), jnp.asarray(tz),
                                          v_min, v_max, n))
    want = _project_ref(probs, tz, v_min, v_max, n)
    np.testing.assert_allclose(got, want, atol=1e-5)
    np.testing.assert_allclose(got.sum(1), 1.0, atol=1e-5)  # mass conserved


def test_projection_support_edges():
    """Atoms clipped to the support edges keep all their mass there."""
    n = 11
    probs = jnp.ones((1, n)) / n
    tz = jnp.full((1, n), -999.0)   # far below v_min
    m = project_distribution(probs, tz, -1.0, 1.0, n)
    np.testing.assert_allclose(np.asarray(m[0, 0]), 1.0, atol=1e-6)
    tz = jnp.full((1, n), 999.0)    # far above v_max
    m = project_distribution(probs, tz, -1.0, 1.0, n)
    np.testing.assert_allclose(np.asarray(m[0, -1]), 1.0, atol=1e-6)


def test_c51_head_shapes_and_dueling_constraint():
    k = jax.random.PRNGKey(0)
    net = build_q_network("ram", (6, 8), num_atoms=17)
    p = net.init(k, jnp.zeros((2, 6, 8)))
    logits = net.apply(p, jnp.zeros((5, 6, 8)))
    assert logits.shape == (5, 7, 17) and logits.dtype == jnp.float32

    conv = build_q_network("grayscale", (84, 84), num_atoms=51, dueling=True)
    p = conv.init(k, jnp.zeros((1, 84, 84, 1)))
    logits = conv.apply(p, jnp.zeros((2, 84, 84, 1)))
    assert logits.shape == (2, 7, 51)

    # dueling identifiability: mean advantage over actions is removed, so the
    # per-atom mean over actions equals the value branch alone -> adding a
    # constant to all advantage logits cannot change the output
    head = C51Head(num_actions=3, num_atoms=5, dueling=True,
                   dtype=jnp.float32)   # f32: the check is exact algebra
    hp = head.init(k, jnp.zeros((2, 16)))
    x = jax.random.normal(k, (2, 16))
    out = head.apply(hp, x)
    hp2 = jax.tree.map(lambda a: a, hp)
    b = hp2["params"]["advantage"]["bias"]
    hp2["params"]["advantage"]["bias"] = b + 7.0
    np.testing.assert_allclose(np.asarray(head.apply(hp2, x)),
                               np.asarray(out), atol=1e-4)


def _tiny_cfg(**kw):
    return DQNConfig(
        env=EnvConfig(obs_type="ram", auto_reset=True, reward_step=True,
                      width=6, height=8),
        num_envs=16, buffer_capacity=1024, learn_batch=64, learn_starts=64,
        eps_decay_steps=200, target_update_period=10,
        distributional=True, num_atoms=21, **kw)


def test_c51_train_loop_runs_and_updates():
    cfg = _tiny_cfg()
    init_fn, step_fn, chunk_fn, _ = make_train(cfg)
    state = init_fn(jax.random.PRNGKey(0))
    p0 = jax.tree.map(np.asarray, state.params)
    state, metrics = jax.jit(lambda s: chunk_fn(s, 20))(state)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["mean_q"]))
    # params actually moved once learning started
    moved = jax.tree.map(lambda a, b: np.abs(np.asarray(a) - b).max(),
                         state.params, p0)
    assert max(jax.tree.leaves(moved)) > 0
    # C51 loss is a cross-entropy: strictly positive once learning
    assert float(metrics["loss"]) > 0


def test_c51_all_features_combined():
    """C51 + PER + n-step + dueling + frame stack in one config (Rainbow-style)."""
    cfg = _tiny_cfg(prioritized=True, n_step=3, dueling=True, frame_stack=2)
    init_fn, step_fn, chunk_fn, _ = make_train(cfg)
    state = init_fn(jax.random.PRNGKey(1))
    state, metrics = jax.jit(lambda s: chunk_fn(s, 16))(state)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["td_abs_err"]))
    # PER priorities were written back as positive cross-entropies
    pr = np.asarray(state.replay.priority)
    assert (pr >= 0).all() and np.isfinite(pr).all()


def test_c51_greedy_matches_expected_value_argmax():
    cfg = _tiny_cfg()
    init_fn, _, _, network = make_train(cfg)
    state = init_fn(jax.random.PRNGKey(2))
    logits = network.apply(state.params, state.obs)
    support = jnp.linspace(cfg.v_min, cfg.v_max, cfg.num_atoms)
    q = (jax.nn.softmax(logits, axis=-1) * support).sum(-1)
    # the affine-invariance the evaluate CLI relies on: argmax over an
    # index-surrogate support equals argmax over the real support
    idx = jnp.arange(cfg.num_atoms, dtype=jnp.float32)
    q_idx = (jax.nn.softmax(logits, axis=-1) * idx).sum(-1)
    np.testing.assert_array_equal(np.asarray(jnp.argmax(q, 1)),
                                  np.asarray(jnp.argmax(q_idx, 1)))
