"""Weak-scaling benchmark over the device mesh.

Runs the sharded rollout at a fixed per-device batch while growing the device
count, reporting env-steps/s per device (ideal weak scaling = flat). On a
multi-host pod run one process per host with ``init_distributed``; on a single
machine it subsets the local devices. Also runnable on the fake CPU mesh
(JAX_PLATFORMS=cpu with --xla_force_host_platform_device_count=N) to validate
sharding behavior without hardware.

    python -m gym_simpletetris_tpu.parallel.scaling_bench --per-device 4096
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import EnvConfig
from .mesh import ShardedTetrisEnv, make_data_mesh


def bench_mesh(cfg: EnvConfig, n_devices: int, per_device: int, steps: int,
               chunk: int) -> dict:
    devices = jax.devices()[:n_devices]
    mesh = make_data_mesh(devices)
    B = per_device * n_devices
    env = ShardedTetrisEnv(cfg, B, mesh)
    obs, state = env.reset(jax.random.PRNGKey(0))
    actions = jax.random.randint(jax.random.PRNGKey(1), (chunk, B), 0, 7,
                                 dtype=jnp.int32)
    state, acc, rew, done = env.rollout(state, actions)   # warmup/compile
    np.asarray(rew[-1, :1])
    n_chunks = max(1, steps // chunk)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state, acc, rew, done = env.rollout(state, actions)
    np.asarray(rew[-1, :1])
    dt = time.perf_counter() - t0
    total = n_chunks * chunk * B
    return {
        "devices": n_devices, "global_batch": B,
        "env_steps_per_sec": round(total / dt, 1),
        "per_device_steps_per_sec": round(total / dt / n_devices, 1),
        "wall_s": round(dt, 3),
    }


def bench_train_mesh(ecfg: EnvConfig, n_devices: int, per_device: int,
                     steps: int, chunk: int) -> dict:
    """Weak-scaling of the FULL actor-learner: mesh-aware ``make_train``
    (env step + obs + replay insert + TD learner + target sync), env batch
    fixed per device."""
    from ..train.dqn import DQNConfig, make_train
    from .mesh import make_data_mesh

    devices = jax.devices()[:n_devices]
    mesh = make_data_mesh(devices)
    B = per_device * n_devices
    cfg = DQNConfig(env=ecfg, num_envs=B, buffer_capacity=B * 16,
                    learn_batch=max(64, B // 4), learn_starts=B * 2)
    init_fn, _, chunk_fn, _ = make_train(cfg, mesh=mesh)
    state = init_fn(jax.random.PRNGKey(0))
    state, m = chunk_fn(state, chunk)                     # warmup/compile
    np.asarray(m["mean_q"])
    n_chunks = max(1, steps // chunk)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state, m = chunk_fn(state, chunk)
    np.asarray(m["mean_q"])
    dt = time.perf_counter() - t0
    total = n_chunks * chunk * B
    return {
        "devices": n_devices, "global_batch": B, "mode": "actor_learner",
        "env_steps_per_sec": round(total / dt, 1),
        "per_device_steps_per_sec": round(total / dt / n_devices, 1),
        "learn_steps": int(np.asarray(state.learn_steps)),
        "wall_s": round(dt, 3),
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--obs", default="ram", choices=["ram", "grayscale", "rgb"])
    p.add_argument("--per-device", type=int, default=4096)
    p.add_argument("--steps", type=int, default=1024)
    p.add_argument("--chunk", type=int, default=128)
    p.add_argument("--device-counts", default=None,
                   help="comma list, default 1,2,4,...,N")
    p.add_argument("--train", action="store_true",
                   help="weak-scale the full DQN actor-learner instead of "
                        "the bare env rollout")
    args = p.parse_args(argv)

    cfg = EnvConfig(obs_type=args.obs, auto_reset=True,
                    reward_step=args.train)
    n = len(jax.devices())
    if args.device_counts:
        counts = [int(c) for c in args.device_counts.split(",")]
    else:
        counts = [c for c in (1, 2, 4, 8, 16, 32, 64) if c <= n]
    results = []
    for c in counts:
        if args.train:
            r = bench_train_mesh(cfg, c, args.per_device, args.steps,
                                 args.chunk)
        else:
            r = bench_mesh(cfg, c, args.per_device, args.steps, args.chunk)
        results.append(r)
        print(json.dumps(r), flush=True)
    if len(results) > 1:
        eff = (results[-1]["per_device_steps_per_sec"]
               / results[0]["per_device_steps_per_sec"])
        print(json.dumps({"weak_scaling_efficiency": round(eff, 3),
                          "from": counts[0], "to": counts[-1]}), flush=True)
    return results


if __name__ == "__main__":
    main()
