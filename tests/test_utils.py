"""Checkpoint round-trip and profiling utility tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_simpletetris_tpu import EnvConfig, TetrisVectorEnv
from gym_simpletetris_tpu.utils.checkpoint import (
    restore_checkpoint, save_checkpoint)
from gym_simpletetris_tpu.utils.profiling import cost_analysis, debug_mode


def test_env_state_checkpoint_roundtrip(tmp_path):
    cfg = EnvConfig(auto_reset=True)
    env = TetrisVectorEnv(cfg, 8)
    obs, state = env.reset(jax.random.PRNGKey(0))
    for t in range(20):
        obs, state, *_ = env.step(state, jnp.full((8,), 2, jnp.int32))

    path = save_checkpoint(str(tmp_path / "env_ckpt"), state)
    restored = restore_checkpoint(path, target=state)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state, restored)

    # resuming from the restored state is bit-identical to continuing
    o1, s1, r1, d1, _ = env.step(state, jnp.full((8,), 3, jnp.int32))
    o2, s2, r2, d2, _ = env.step(restored, jnp.full((8,), 3, jnp.int32))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(s1.rows), np.asarray(s2.rows))


def test_dqn_state_checkpoint_roundtrip(tmp_path):
    from gym_simpletetris_tpu.train.dqn import DQNConfig, make_train
    cfg = DQNConfig(env=EnvConfig(obs_type="ram", auto_reset=True,
                                  width=6, height=8),
                    num_envs=8, buffer_capacity=128, learn_batch=16,
                    learn_starts=16)
    init_fn, step_fn, chunk_fn, _ = make_train(cfg)
    state = init_fn(jax.random.PRNGKey(0))
    state, _ = jax.jit(lambda s: chunk_fn(s, 5))(state)
    path = save_checkpoint(str(tmp_path / "dqn_ckpt"), state)
    restored = restore_checkpoint(path, target=state)
    assert int(restored.step) == int(state.step)
    s1, m1 = jax.jit(step_fn)(state)
    s2, m2 = jax.jit(step_fn)(restored)
    assert float(m1["mean_q"]) == float(m2["mean_q"])


def test_cost_analysis_reports_flops():
    ca = cost_analysis(
        lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32),
        jnp.zeros((128, 128), jnp.float32), jnp.zeros((128, 128), jnp.float32))
    assert isinstance(ca, dict)
    assert ca.get("flops", 0) > 0


def test_debug_mode_catches_nan():
    with debug_mode():
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: x / x)(jnp.zeros((4,)))


def test_metric_logger_sinks(tmp_path):
    from gym_simpletetris_tpu.utils.metrics import MetricLogger
    import json as _json
    jl = tmp_path / "m.jsonl"
    tb = tmp_path / "tb"
    with MetricLogger(jsonl_path=str(jl), tensorboard_dir=str(tb),
                      stdout=False) as log:
        log.log({"loss": 1.5, "q": 2.0}, step=1)
        log.log({"loss": 1.0, "q": 3.0}, step=2)
    recs = [_json.loads(l) for l in jl.read_text().splitlines()]
    assert recs[1]["loss"] == 1.0 and recs[1]["step"] == 2
    assert any(tb.iterdir())   # tensorboard event file written
