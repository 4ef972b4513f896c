"""REAL multi-process (multi-controller) execution: 2 OS processes x 4 fake
CPU devices each, connected via jax.distributed (Gloo collectives) — the same
code path a multi-host TPU pod uses over DCN, minus the hardware
(SURVEY.md §2.6 / §4.4; parallel/mesh.init_distributed).

Each worker builds the global 8-device data mesh, resets a ShardedTetrisEnv
with the SAME global key, scans a rollout, psums a global metric, and dumps
its (addressable-shard) rewards. The parent asserts:
  - both processes agree on the psum'd global metric,
  - the concatenated per-process shards equal a single-process 8-device run
    of the identical program, bitwise.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
pid, nproc, port, outdir = (sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
# NOTE: deliberately NO JAX_COMPILATION_CACHE_DIR here — sharing the
# persistent compile cache between concurrent multi-controller workers was
# measured to stall them past the subprocess timeout (cache-write
# coordination), where the uncached run takes ~20 s.
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")
from gym_simpletetris_tpu.parallel.mesh import (init_distributed,
                                                make_data_mesh,
                                                ShardedTetrisEnv)
init_distributed(f"localhost:{port}", int(nproc), int(pid))
assert jax.device_count() == 8 and jax.local_device_count() == 4
import numpy as np
import jax.numpy as jnp
from gym_simpletetris_tpu import EnvConfig

mesh = make_data_mesh()
env = ShardedTetrisEnv(EnvConfig(auto_reset=True, reward_step=True),
                       global_batch=64, mesh=mesh)
obs, state = env.reset(jax.random.PRNGKey(0))
acts = jax.random.randint(jax.random.PRNGKey(1), (32, 64), 0, 7,
                          dtype=jnp.int32)
fs, acc, rew, done = env.rollout(state, acts)
total = float(jax.jit(lambda r: r.sum())(rew))  # global psum-equivalent sum

# addressable shard of the [T, B] rewards, with its global batch offset
shards = [(s.index, np.asarray(s.data)) for s in rew.addressable_shards]
cols = sorted((idx[1].start if idx[1].start else 0, d) for idx, d in shards)
local = np.concatenate([d for _, d in cols], axis=1)
start = cols[0][0]
np.save(f"{outdir}/rew_{pid}.npy", local)
np.save(f"{outdir}/meta_{pid}.npy", np.array([start, total]))
print(f"worker {pid} ok", flush=True)
""" % {"repo": REPO}


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_rollout_bitwise(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS",
                        "JAX_COMPILATION_CACHE_DIR")}
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), "2", str(port), str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"

    meta0 = np.load(tmp_path / "meta_0.npy")
    meta1 = np.load(tmp_path / "meta_1.npy")
    # both controllers computed the same global reward sum
    assert meta0[1] == meta1[1]

    # reassemble the global [T, B] rewards from the two processes' shards
    parts = sorted(
        [(int(meta0[0]), np.load(tmp_path / "rew_0.npy")),
         (int(meta1[0]), np.load(tmp_path / "rew_1.npy"))])
    global_rew = np.concatenate([d for _, d in parts], axis=1)
    assert global_rew.shape == (32, 64)

    # golden: the identical program on this process's own 8-device mesh
    import jax
    import jax.numpy as jnp
    from gym_simpletetris_tpu import EnvConfig
    from gym_simpletetris_tpu.parallel.mesh import (make_data_mesh,
                                                    ShardedTetrisEnv)
    mesh = make_data_mesh()
    senv = ShardedTetrisEnv(EnvConfig(auto_reset=True, reward_step=True),
                            global_batch=64, mesh=mesh)
    obs, state = senv.reset(jax.random.PRNGKey(0))
    acts = jax.random.randint(jax.random.PRNGKey(1), (32, 64), 0, 7,
                              dtype=jnp.int32)
    fs, acc, rew, done = senv.rollout(state, acts)
    np.testing.assert_array_equal(global_rew, np.asarray(rew))
    assert float(np.asarray(rew).sum()) == meta0[1]


LEARNER_WORKER = r"""
import os, sys
pid, nproc, port, outdir = (sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
# NOTE: deliberately NO JAX_COMPILATION_CACHE_DIR here — sharing the
# persistent compile cache between concurrent multi-controller workers was
# measured to stall them past the subprocess timeout (cache-write
# coordination), where the uncached run takes ~20 s.
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")
from gym_simpletetris_tpu.parallel.mesh import init_distributed, DATA_AXIS
init_distributed(f"localhost:{port}", int(nproc), int(pid))
assert jax.device_count() == 8 and jax.local_device_count() == 4
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh
from gym_simpletetris_tpu import EnvConfig
from gym_simpletetris_tpu.train.dqn import DQNConfig, make_train

mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), (DATA_AXIS, "model"))
cfg = DQNConfig(
    env=EnvConfig(obs_type="ram", auto_reset=True, reward_step=True,
                  width=6, height=8),
    num_envs=16, buffer_capacity=256, learn_batch=16, learn_starts=32,
    target_update_period=5)
init_fn, step_fn, _, _ = make_train(cfg, mesh=mesh)
state = init_fn(jax.random.PRNGKey(7))
for _ in range(40):
    state, metrics = step_fn(state)
# fully-addressable (replicated across the mesh) learner params: dump leaves
leaves = jax.tree_util.tree_leaves_with_path(state.params)
flat = np.concatenate(
    [np.asarray(jax.jit(lambda x: x,
                        out_shardings=jax.sharding.NamedSharding(
                            mesh, jax.sharding.PartitionSpec()))(l)).ravel()
     for _, l in leaves])
np.save(f"{outdir}/params_{pid}.npy", flat)
np.save(f"{outdir}/lsteps_{pid}.npy",
        np.array([int(state.learn_steps),
                  float(np.asarray(metrics["loss"]))]))
print(f"learner worker {pid} ok", flush=True)
""" % {"repo": REPO}


def test_two_process_dqn_train_step(tmp_path):
    """The full actor-learner (BASELINE config 5 shape): 2 controller
    processes x 4 fake devices run 40 mesh-aware DQN train steps (DP x TP via
    make_train(cfg, mesh=...)); both controllers' final params must agree with
    each other and with a single-process run of the identical program."""
    port = _free_port()
    script = tmp_path / "learner_worker.py"
    script.write_text(LEARNER_WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS",
                        "JAX_COMPILATION_CACHE_DIR")}
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), "2", str(port), str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            # generous: cold persistent-compile-cache runs on a loaded host
            # have been observed near 6 min; the warm-cache run takes ~20 s
            out, _ = p.communicate(timeout=720)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"learner worker {pid} failed:\n{out[-3000:]}"

    p0 = np.load(tmp_path / "params_0.npy")
    p1 = np.load(tmp_path / "params_1.npy")
    np.testing.assert_array_equal(p0, p1)   # controllers agree bitwise
    ls0 = np.load(tmp_path / "lsteps_0.npy")
    assert ls0[0] > 0 and np.isfinite(ls0[1])

    # single-process golden of the identical program
    import jax
    from jax.sharding import Mesh
    from gym_simpletetris_tpu import EnvConfig
    from gym_simpletetris_tpu.parallel.mesh import DATA_AXIS
    from gym_simpletetris_tpu.train.dqn import DQNConfig, make_train
    mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), (DATA_AXIS, "model"))
    cfg = DQNConfig(
        env=EnvConfig(obs_type="ram", auto_reset=True, reward_step=True,
                      width=6, height=8),
        num_envs=16, buffer_capacity=256, learn_batch=16, learn_starts=32,
        target_update_period=5)
    init_fn, step_fn, _, _ = make_train(cfg, mesh=mesh)
    state = init_fn(jax.random.PRNGKey(7))
    for _ in range(40):
        state, metrics = step_fn(state)
    golden = np.concatenate(
        [np.asarray(l).ravel() for _, l in
         jax.tree_util.tree_leaves_with_path(state.params)])
    np.testing.assert_allclose(p0, golden, rtol=1e-5, atol=1e-7)
