"""Evolution Strategies trainer tests (train/es.py).

The reference ships no training code (SURVEY.md §3.5); ES is the framework's
third trainer family. Tests: shaping math vs numpy, antithetic structure,
update math vs a brute-force reference, learning on a tiny board, mesh run.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gym_simpletetris_tpu import EnvConfig
from gym_simpletetris_tpu.train.es import (ESConfig, ESState, centered_ranks,
                                           make_es, train)


def _tiny_cfg(**kw):
    kw.setdefault("pop_size", 8)
    kw.setdefault("envs_per_member", 2)
    kw.setdefault("horizon", 32)
    kw.setdefault("hidden", (16,))
    return ESConfig(
        env=EnvConfig(obs_type="ram", auto_reset=True, reward_step=True,
                      width=6, height=8), **kw)


def test_centered_ranks_matches_numpy():
    f = jnp.asarray([3.0, -1.0, 7.0, 0.0, 7.5])
    got = np.asarray(centered_ranks(f))
    order = np.argsort(np.argsort(np.asarray(f), kind="stable"),
                       kind="stable")
    want = order / 4 - 0.5
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert abs(got.sum()) < 1e-6          # centered
    assert got.min() == -0.5 and got.max() == 0.5


def test_config_validation():
    with pytest.raises(ValueError):
        _tiny_cfg(pop_size=7)             # odd: no antithetic pairs
    with pytest.raises(ValueError):
        ESConfig(env=EnvConfig(obs_type="ram", auto_reset=False))


def test_generation_step_shapes_and_determinism():
    cfg = _tiny_cfg()
    init_fn, gen_fn, net = make_es(cfg)
    s0 = init_fn(jax.random.PRNGKey(0))
    gen = jax.jit(gen_fn)
    s1, m1 = gen(s0)
    s1b, m1b = gen(s0)
    assert int(s1.generation) == 1
    assert s1.theta.shape == s0.theta.shape
    np.testing.assert_array_equal(np.asarray(s1.theta), np.asarray(s1b.theta))
    for v in m1.values():
        assert np.isfinite(float(v))
    # fitness_max >= fitness_mean by construction
    assert float(m1["fitness_max"]) >= float(m1["fitness_mean"])


def test_update_matches_bruteforce_reference():
    """es_update (the exact function gen_step_fn applies) against a plain
    numpy re-derivation of Salimans et al. eq. for random eps/fitness —
    including antithetic eps, rank shaping, and weight decay."""
    from gym_simpletetris_tpu.train.es import es_update
    rng = np.random.RandomState(0)
    dim, pop, sigma, lr, wd = 37, 12, 0.07, 0.03, 0.01
    theta = rng.randn(dim).astype(np.float32)
    eps_half = rng.randn(pop // 2, dim).astype(np.float32)
    eps = np.concatenate([eps_half, -eps_half])
    fitness = rng.randn(pop).astype(np.float32)

    got_theta, got_grad = es_update(
        jnp.asarray(theta), jnp.asarray(eps), jnp.asarray(fitness),
        sigma=sigma, lr=lr, weight_decay=wd, rank_shaping=True)

    ranks = np.argsort(np.argsort(fitness, kind="stable"),
                       kind="stable").astype(np.float32)
    shaped = ranks / (pop - 1) - 0.5
    grad = shaped @ eps / (pop * sigma)
    want = (1 - lr * wd) * theta + lr * grad
    np.testing.assert_allclose(np.asarray(got_grad), grad, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_theta), want, atol=1e-5)

    # z-score shaping branch
    got_theta2, got_grad2 = es_update(
        jnp.asarray(theta), jnp.asarray(eps), jnp.asarray(fitness),
        sigma=sigma, lr=lr, weight_decay=wd, rank_shaping=False)
    z = (fitness - fitness.mean()) / (fitness.std() + 1e-8)
    grad2 = z @ eps / (pop * sigma)
    np.testing.assert_allclose(np.asarray(got_grad2), grad2, atol=1e-4)

    # antithetic identity: a constant fitness produces (near-)zero rank grad
    # only via cancellation of +eps/-eps pairs with symmetric shaped weights
    f_sym = np.arange(pop, dtype=np.float32)
    f_sym = np.concatenate([f_sym[: pop // 2], f_sym[: pop // 2][::-1]])
    _, g_sym = es_update(
        jnp.asarray(theta), jnp.asarray(eps), jnp.asarray(f_sym),
        sigma=sigma, lr=lr, weight_decay=wd, rank_shaping=True)
    assert np.isfinite(np.asarray(g_sym)).all()


def test_es_learns_on_tiny_board():
    """Mean fitness after a few generations beats generation 1 (reward_step
    + penalise_holes: surviving longer and stacking cleanly scores higher)."""
    cfg = _tiny_cfg(pop_size=32, envs_per_member=2, horizon=64,
                    lr=0.05, sigma=0.1)
    first, last = [], []
    state = None

    def log(rec):
        (first if rec["generation"] <= 2 else last).append(
            rec["fitness_mean"])

    state = train(cfg, 12, key=jax.random.PRNGKey(0), log_fn=log)
    assert int(state.generation) == 12
    assert np.mean(last[-3:]) > np.mean(first)


def test_es_mesh_runs():
    from jax.sharding import Mesh
    from gym_simpletetris_tpu.parallel.mesh import DATA_AXIS
    devs = np.asarray(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devs, (DATA_AXIS,))
    cfg = _tiny_cfg(pop_size=8, envs_per_member=2)
    init_fn, gen_fn, _ = make_es(cfg, mesh=mesh)
    state = init_fn(jax.random.PRNGKey(0))
    state, m = gen_fn(state)
    assert np.isfinite(float(m["fitness_mean"]))
    # matches the unsharded generation (same replicated draws)
    i2, g2, _ = make_es(cfg)
    s2 = i2(jax.random.PRNGKey(0))
    s2, m2 = jax.jit(g2)(s2)
    np.testing.assert_allclose(np.asarray(state.theta), np.asarray(s2.theta),
                               atol=1e-6)


def test_es_ckpt_and_evaluate_cli(tmp_path):
    """run_es --ckpt then evaluate --policies es loads and acts greedily."""
    from gym_simpletetris_tpu.train import run_es
    from gym_simpletetris_tpu.train import evaluate as ev
    ck = str(tmp_path / "es_ck")
    state = run_es.main(["--width", "6", "--height", "8", "--pop", "8",
                         "--envs-per-member", "2", "--horizon", "16",
                         "--generations", "2", "--hidden", "16",
                         "--ckpt", ck, "--seed", "0"])
    assert int(state.generation) == 2
    res = ev.main(["--policies", "es", "--width", "6", "--height", "8",
                   "--num-envs", "8", "--steps", "40", "--ckpt", ck,
                   "--es-hidden", "16"])
    assert "es" in res and res["es"]["total_deaths"] >= 0
