"""NoisyNet tests: layer semantics, exploration wiring, full Rainbow combo.

The reference ships no model code (SURVEY.md §2.6); NoisyDense
(models/dqn.py, Fortunato et al. 2018) completes the bundled Rainbow family.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gym_simpletetris_tpu import EnvConfig
from gym_simpletetris_tpu.models.dqn import NoisyDense, build_q_network
from gym_simpletetris_tpu.train.dqn import DQNConfig, make_train


def _layer_and_params():
    layer = NoisyDense(8, dtype=jnp.float32)
    params = layer.init(jax.random.PRNGKey(0), jnp.zeros((2, 16)))
    return layer, params


def test_noisy_dense_param_structure_and_init_scale():
    _, params = _layer_and_params()
    p = params["params"]
    assert set(p) == {"kernel_mu", "kernel_sigma", "bias_mu", "bias_sigma"}
    assert p["kernel_mu"].shape == (16, 8)
    bound = 1 / np.sqrt(16)
    km = np.asarray(p["kernel_mu"])
    assert (np.abs(km) <= bound + 1e-6).all() and km.std() > 0
    np.testing.assert_allclose(np.asarray(p["kernel_sigma"]), 0.5 / 4.0)


def test_noisy_dense_deterministic_without_noise_rng():
    layer, params = _layer_and_params()
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16))
    y1 = layer.apply(params, x)
    y2 = layer.apply(params, x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    # and equals the mu-only affine map
    p = params["params"]
    want = x @ p["kernel_mu"] + p["bias_mu"]
    np.testing.assert_allclose(np.asarray(y1), np.asarray(want), atol=1e-5)


def test_noisy_dense_noise_reproducible_and_varying():
    layer, params = _layer_and_params()
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16))
    ya = layer.apply(params, x, rngs={"noise": jax.random.PRNGKey(7)})
    yb = layer.apply(params, x, rngs={"noise": jax.random.PRNGKey(7)})
    yc = layer.apply(params, x, rngs={"noise": jax.random.PRNGKey(8)})
    y0 = layer.apply(params, x)
    np.testing.assert_array_equal(np.asarray(ya), np.asarray(yb))
    assert np.abs(np.asarray(ya) - np.asarray(yc)).max() > 0
    assert np.abs(np.asarray(ya) - np.asarray(y0)).max() > 0


def test_noisy_network_variants_build_and_apply():
    k = jax.random.PRNGKey(0)
    for obs_type, shape in (("ram", (6, 8)), ("grayscale", (84, 84, 1))):
        net = build_q_network(obs_type, shape, noisy=True, dueling=True)
        p = net.init(k, jnp.zeros((1,) + shape))
        # deterministic path (no noise rng)
        q = net.apply(p, jnp.zeros((2,) + shape))
        assert q.shape == (2, 7)
        # noisy path
        qn = net.apply(p, jnp.zeros((2,) + shape),
                       rngs={"noise": jax.random.PRNGKey(3)})
        assert np.abs(np.asarray(qn) - np.asarray(q)).max() > 0


def test_full_rainbow_train_loop():
    """All six Rainbow components at once: double + dueling + PER + n-step +
    C51 + noisy; epsilon must be reported as 0 (exploration = param noise)."""
    cfg = DQNConfig(
        env=EnvConfig(obs_type="ram", auto_reset=True, reward_step=True,
                      width=6, height=8),
        num_envs=16, buffer_capacity=1024, learn_batch=64, learn_starts=64,
        eps_decay_steps=200, target_update_period=10,
        distributional=True, num_atoms=21, prioritized=True, n_step=3,
        dueling=True, noisy=True)
    init_fn, step_fn, chunk_fn, _ = make_train(cfg)
    state = init_fn(jax.random.PRNGKey(0))
    p0 = jax.tree.map(np.asarray, state.params)
    state, metrics = jax.jit(lambda s: chunk_fn(s, 20))(state)
    assert np.isfinite(float(metrics["loss"])) and float(metrics["loss"]) > 0
    assert float(metrics["epsilon"]) == 0.0
    moved = jax.tree.map(lambda a, b: np.abs(np.asarray(a) - b).max(),
                         state.params, p0)
    assert max(jax.tree.leaves(moved)) > 0
    # sigma params exist and were trained
    sig = [np.asarray(l) for path, l in
           jax.tree_util.tree_leaves_with_path(state.params)
           if "sigma" in jax.tree_util.keystr(path)]
    assert sig and all(np.isfinite(s).all() for s in sig)


def test_noisy_actor_explores_without_epsilon():
    """With noisy=True, consecutive steps take different greedy actions even
    at epsilon 0 (parameter noise is resampled each step)."""
    cfg = DQNConfig(
        env=EnvConfig(obs_type="ram", auto_reset=True, width=6, height=8),
        num_envs=32, buffer_capacity=512, learn_batch=32, learn_starts=1 << 30,
        noisy=True)   # learner gated off: isolate the actor
    init_fn, step_fn, _, _ = make_train(cfg)
    state = init_fn(jax.random.PRNGKey(0))
    step = jax.jit(step_fn)
    seen = set()
    for _ in range(6):
        state, _ = step(state)
        # recover the actions taken from the newest replay row
        row = (int(state.replay.ptr) - 1) % state.replay.slots
        seen.add(tuple(np.asarray(state.replay.action[row]).tolist()))
    assert len(seen) > 1   # noise produced varying action patterns
