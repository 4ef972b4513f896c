#!/usr/bin/env python
"""Throughput benchmark: env-steps/s at B=4096 on one chip (BASELINE.json metric).

Prints exactly ONE JSON line to stdout (the ram headline, carrying a
``regressed`` verdict aggregated over every metric measured):
  {"metric": ..., "value": N, "unit": "env_steps/s", "vs_baseline": N,
   "regressed": false}
and, by default, one JSON line per obs type (ram, grayscale, rgb), the ram
B=16384 record config, the two delivered-f32 materialization configs, and
one line per trainer family — the flagship Rainbow conv at its canonical
le=4 point, PPO ram at 1024x64 with shuffle_block=64, and ES at 1024x8 —
to stderr so the driver artifact captures them too, each with a ``floor``
(round-record minus jitter margin) and per-line ``regressed`` flag.

vs_baseline compares against the reference implementation measured in
BASELINE.md (single-process Python on CPU): 22,500 steps/s for obs_type=ram,
4,600 for grayscale, 3,700 for rgb (TetrisEnv.step, tetris_env.py:397-403).

The timed region is the full env pipeline: random actions, batched transition,
observation rendering, auto-reset. Stepping is fused over scan chunks to
amortize dispatch; that is the intended deployment shape (actor loops live on
device). The observation pipeline is kept live under XLA's DCE by folding each
step's observation into an accumulator. ``--acc`` picks what is accumulated:

  storage   (default) the canonical uint8 observation — exactly what a replay
            buffer stores or a conv stem reads; the delivered-dtype cast and
            the rgb channel broadcast are exact elementwise views that XLA
            fuses into the consumer, so this is the deployment-shaped number.
  delivered the fully materialized delivered observation (cfg.obs_dtype, rgb
            channels expanded) — the conservative round-1 measurement.

Usage: python bench.py [--obs ram|grayscale|rgb] [--batch 4096] [--steps 16384]
                       [--chunk 1024] [--impl auto|sep|bcast|matmul|gather|pallas]
                       [--acc storage|delivered] [--profile-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__) or ".",
                                   ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from gym_simpletetris_tpu import EnvConfig, TetrisVectorEnv

REF_BASELINE = {"ram": 22_500.0, "grayscale": 4_600.0, "rgb": 3_700.0}

# Regression floors (env-steps/s) per driver metric: the round-3 records
# (BENCH_r03.json: ram 144.3M / gray 35.4M / rgb 35.35M @ B=4096,
# ram 162.5M @ B=16384, delivered gray-f32 22.6M / rgb-f32 3.83M) minus a
# ~13% margin covering the remote backend's observed run-to-run dispatch
# jitter (BENCH_LOCAL.md; host contention measured up to 25-40% is NOT
# covered — official runs require a quiet host). A value below its floor
# sets "regressed": true on that line and on the headline, making the
# driver artifact a pass/fail verdict rather than numbers needing a human
# diff (the pytest perf floors are TPU-gated and perpetually skip on the
# CPU suite host, tests/test_perf_floor.py).
FLOORS = {
    "env_steps_per_sec_ram_b4096": 125e6,
    "env_steps_per_sec_grayscale_b4096": 31e6,
    "env_steps_per_sec_rgb_b4096": 31e6,
    "env_steps_per_sec_ram_b16384": 140e6,
    "env_steps_per_sec_grayscale_b4096_delivered_f32": 19e6,
    "env_steps_per_sec_rgb_b4096_delivered_f32": 3.3e6,
    # flagship Rainbow conv trainer at its canonical operating point
    # (256 envs, learn_every=4, obs-ring layout): round-4 record 369k;
    # floor = the round-3 verdict's own >=330k target for this axis
    "train_env_steps_per_sec_flagship_le4": 330e3,
    # PPO ram at its swept record shape (2048 envs x 64, 2 epochs x 8
    # minibatches, shuffle_block=64 — the 10M-north-star configuration,
    # BENCH_LOCAL rounds 4-5; 9.2M same-session round 5) and ES at its
    # 1024-member x 8-envs record shape — the round-4 verdict's "records
    # must live where the driver captures them" rule
    "train_env_steps_per_sec_ppo_ram_block64": 8.0e6,
    "train_env_steps_per_sec_es_1024x8": 38e6,
    # flagship at the same operating point with the round-5 recommended
    # variant (sample_slots + noisy_shared_selection — quality-A/B'd
    # equivalent, BENCH_LOCAL round 5): record 384-385k
    "train_env_steps_per_sec_flagship_le4_slots": 350e3,
}
# Floor provenance: each floor is the best driver/BENCH_LOCAL record for its
# metric minus a ~13% dispatch-jitter margin. tests/test_perf_canary.py::
# test_bench_floors_below_recorded_values ties these constants to the
# checked-in BENCH_r0N.json artifacts so a stale floor fails the CPU suite
# instead of silently loosening the regression verdict.


def bench_flagship_trainer(variant: str = "") -> dict:
    """One driver-artifact line for the flagship TRAINER (the env lines
    above cover the environment only): full Rainbow conv DQN — gray-u8 +
    4-frame stack + PER + 3-step + dueling + C51 + noisy — at the canonical
    256-env / learn_every=4 point on the obs-ring replay layout
    (BENCH_LOCAL round 4). ``variant="slots"`` additionally enables the
    round-5 recommended pair (slot-row sampling + shared online noise
    draw — quality-A/B'd learning-equivalent, BENCH_LOCAL round 5).
    Strict end-of-run host-fetch sync."""
    from gym_simpletetris_tpu.train.dqn import DQNConfig, make_train

    cfg = DQNConfig(
        env=EnvConfig(obs_type="grayscale", auto_reset=True,
                      reward_step=True, penalise_height=True),
        num_envs=256, buffer_capacity=65536, learn_batch=512,
        learn_every=4, frame_stack=4, prioritized=True, n_step=3,
        dueling=True, distributional=True, noisy=True,
        frame_ring=True, ring_stacks=True,
        sample_slots=variant == "slots",
        noisy_shared_selection=variant == "slots")
    init_fn, _, chunk_fn, _ = make_train(cfg)
    state = init_fn(jax.random.PRNGKey(0))
    chunk = jax.jit(lambda s: chunk_fn(s, 512))
    state, m = chunk(state)              # compile + warm
    state, m = chunk(state)
    np.asarray(m["loss"])                # sync
    n_chunks = 6
    sps = 0.0
    for _pass in range(2):               # best-of-2 (dispatch jitter)
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            state, m = chunk(state)
        np.asarray(m["loss"])            # sync AFTER the last queued chunk
        sps = max(sps, n_chunks * 512 * cfg.num_envs
                  / (time.perf_counter() - t0))
    return {
        "metric": "train_env_steps_per_sec_flagship_le4" + (
            "_slots" if variant == "slots" else ""),
        "value": round(sps, 1), "unit": "env_steps/s",
        "vs_baseline": round(sps / REF_BASELINE["grayscale"], 1),
        "_detail": {"num_envs": 256, "learn_every": 4,
                    "replay_layout": "obs-ring",
                    "features": "PER+3step+dueling+C51+noisy+stack4" + (
                        "+slot_sampling+shared_noise" if variant == "slots"
                        else ""),
                    "loss": round(float(np.asarray(m["loss"])), 4),
                    "device": str(jax.devices()[0]).replace(" ", "_")},
    }


def bench_ppo_trainer() -> dict:
    """Driver-artifact line for the PPO family at its swept record point
    (2048 envs x 64 rollout, 2 epochs x 8 minibatches — the envs sweep's
    optimum, BENCH_LOCAL round 4) with the recommended vectorized-run
    ``shuffle_block=64`` (round 4: +74% over the exact row shuffle,
    learning-equivalent across 3 seeds). Strict sync."""
    from gym_simpletetris_tpu.train.ppo import PPOConfig, make_ppo

    cfg = PPOConfig(
        env=EnvConfig(obs_type="ram", auto_reset=True,
                      reward_step=True, penalise_holes=True),
        num_envs=2048, rollout_len=64, epochs=2, num_minibatches=8,
        shuffle_block=64)
    init_fn, update_fn, _ = make_ppo(cfg)
    state = init_fn(jax.random.PRNGKey(0))
    upd = jax.jit(update_fn)
    state, m = upd(state)                # compile + warm
    state, m = upd(state)
    np.asarray(m["pg_loss"])             # sync
    n_upd = 20
    sps = 0.0
    for _pass in range(2):               # best-of-2 (dispatch jitter)
        t0 = time.perf_counter()
        for _ in range(n_upd):
            state, m = upd(state)
        np.asarray(m["pg_loss"])         # sync AFTER the last queued update
        sps = max(sps, n_upd * cfg.num_envs * cfg.rollout_len
                  / (time.perf_counter() - t0))
    return {
        "metric": "train_env_steps_per_sec_ppo_ram_block64",
        "value": round(sps, 1), "unit": "env_steps/s",
        "vs_baseline": round(sps / REF_BASELINE["ram"], 1),
        "_detail": {"num_envs": 2048, "rollout_len": 64,
                    "epochs_x_minibatches": "2x8", "shuffle_block": 64,
                    "pg_loss": round(float(np.asarray(m["pg_loss"])), 4),
                    "device": str(jax.devices()[0]).replace(" ", "_")},
    }


def bench_es_trainer() -> dict:
    """Driver-artifact line for the ES family at its record shape
    (pop 1024 x 8 envs/member, horizon 256 — BENCH_LOCAL round 4: 45.7M
    env-steps/s incl. the full generation update). Strict sync."""
    from gym_simpletetris_tpu.train.es import ESConfig, make_es

    cfg = ESConfig(pop_size=1024, envs_per_member=8, horizon=256)
    init_fn, gen_fn, _ = make_es(cfg)
    state = init_fn(jax.random.PRNGKey(0))
    gen = jax.jit(gen_fn)
    state, m = gen(state)                # compile + warm
    state, m = gen(state)
    np.asarray(m["fitness_mean"])        # sync
    n_gen = 3
    steps_per_gen = cfg.pop_size * cfg.envs_per_member * cfg.horizon
    sps = 0.0
    for _pass in range(2):
        t0 = time.perf_counter()
        for _ in range(n_gen):
            state, m = gen(state)
        np.asarray(m["fitness_mean"])    # sync AFTER the last queued gen
        sps = max(sps, n_gen * steps_per_gen / (time.perf_counter() - t0))
    return {
        "metric": "train_env_steps_per_sec_es_1024x8",
        "value": round(sps, 1), "unit": "env_steps/s",
        "vs_baseline": round(sps / REF_BASELINE["ram"], 1),
        "_detail": {"pop_size": 1024, "envs_per_member": 8, "horizon": 256,
                    "fitness_mean": round(float(np.asarray(m["fitness_mean"])), 3),
                    "device": str(jax.devices()[0]).replace(" ", "_")},
    }


def _apply_floor(r: dict) -> dict:
    floor = FLOORS.get(r["metric"])
    if floor is not None:
        r["floor"] = floor
        r["regressed"] = r["value"] < floor
    return r


def bench_one(obs_type: str, batch: int, steps: int, chunk: int, impl: str,
              acc_mode: str, profile_dir: str | None = None) -> dict:
    # "pallas_acc": fused raster+accumulate kernel in the rollout
    # (ops/pallas_raster.raster_accumulate); the per-obs raster stays "sep"
    fused_acc = impl == "pallas_acc" and obs_type != "ram"
    cfg_impl = "sep" if impl == "pallas_acc" else impl
    cfg = EnvConfig(obs_type=obs_type, auto_reset=True, raster_impl=cfg_impl)
    env = TetrisVectorEnv(cfg, batch_size=batch)
    key = jax.random.PRNGKey(0)
    obs, state = env.reset(key)

    n_chunks = max(1, steps // chunk)
    akey = jax.random.PRNGKey(1)
    actions = jax.random.randint(akey, (chunk, batch), 0, 7, dtype=jnp.int32)

    # warmup / compile (synchronize via host fetch — block_until_ready is not
    # a reliable barrier on the remote axon backend, see CLAUDE.md). Three
    # warmup calls: the first compiles; the next absorb first-dispatch
    # lazy-path costs that otherwise pollute a short timed region.
    for _ in range(3):
        state_w, acc, rew, done = env.rollout(state, actions,
                                              acc_mode=acc_mode,
                                              fused_acc=fused_acc)
    np.asarray(rew[-1, :1])

    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    # best-of-3 passes: the remote backend shows multi-percent run-to-run
    # dispatch jitter (host contention); the max is the honest capability
    # number and is what BENCH_LOCAL.md's warm-process sweeps reproduce.
    n_steps = n_chunks * chunk * batch
    sps, best = 0.0, None
    for _pass in range(3):
        t0 = time.perf_counter()
        total_done = jnp.zeros((), jnp.int32)
        for i in range(n_chunks):
            state, acc, rew, done = env.rollout(state, actions,
                                                acc_mode=acc_mode,
                                                fused_acc=fused_acc)
            total_done = total_done + done.sum()
        total_done_host = int(np.asarray(total_done))  # host fetch = barrier
        dt = time.perf_counter() - t0
        if n_steps / dt > sps:
            sps = n_steps / dt
            best = (dt, total_done_host)   # keep _detail consistent w/ value
    dt, total_done_host = best

    if profile_dir:
        jax.profiler.stop_trace()
    return {
        "metric": f"env_steps_per_sec_{obs_type}_b{batch}",
        "value": round(sps, 1),
        "unit": "env_steps/s",
        "vs_baseline": round(sps / REF_BASELINE[obs_type], 1),
        "_detail": {
            "obs_type": obs_type, "batch": batch,
            "timed_env_steps": int(n_steps), "wall_s": round(dt, 4),
            "episodes_finished": total_done_host,
            "device": str(jax.devices()[0]).replace(" ", "_"),
            "raster_impl": impl, "acc_mode": acc_mode,
        },
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--obs", default=None, choices=["ram", "grayscale", "rgb"],
                    help="bench a single obs type (default: all three; "
                         "headline = ram)")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=16384)
    ap.add_argument("--chunk", type=int, default=1024)
    ap.add_argument("--impl", default="auto",
                    choices=["auto", "sep", "sepb", "bcast", "matmul",
                             "gather", "pallas", "pallas_acc"])
    ap.add_argument("--acc", default="storage",
                    choices=["storage", "delivered"])
    ap.add_argument("--profile-dir", default=None)
    ap.add_argument("--no-delivered", action="store_true",
                    help="skip the two delivered-f32 materialization lines")
    ap.add_argument("--no-train", action="store_true",
                    help="skip the flagship trainer line (slow off-TPU)")
    ap.add_argument("--all", action="store_true",
                    help="(default behavior; kept for compatibility)")
    args = ap.parse_args()

    if args.obs is None:
        results = {}
        any_regressed = False
        for obs_type in ("ram", "grayscale", "rgb"):
            r = _apply_floor(bench_one(obs_type, args.batch, args.steps,
                                       args.chunk, args.impl, args.acc))
            results[obs_type] = r
            any_regressed |= r.get("regressed", False)
            print(json.dumps(r), file=sys.stderr, flush=True)
        if args.batch == 4096:
            # single-chip ram record config (round-3 batch sweep found the
            # throughput peak at B=16384, +12% over the B=4096 headline);
            # reported on stderr so the record is driver-captured
            r = _apply_floor(bench_one("ram", 16384, args.steps, args.chunk,
                                       args.impl, args.acc))
            any_regressed |= r.get("regressed", False)
            print(json.dumps(r), file=sys.stderr, flush=True)
        if not args.no_delivered:
            # the fully-materialized float32 image observations (the
            # conservative round-1 measurement shape): a user who pulls f32
            # images to host/numpy pays this path — reported in the driver
            # artifact so the cost of materialization stays pinned
            for obs_type in ("grayscale", "rgb"):
                r = bench_one(obs_type, args.batch,
                              max(args.chunk, args.steps // 4), args.chunk,
                              args.impl, "delivered")
                r["metric"] += "_delivered_f32"
                _apply_floor(r)
                any_regressed |= r.get("regressed", False)
                print(json.dumps(r), file=sys.stderr, flush=True)
        if not args.no_train:
            # trainer lines: flagship Rainbow conv (exact algorithm + the
            # round-5 recommended slots variant), PPO ram, ES — floored
            # lines per trainer family so none of the records can regress
            # outside the driver artifact
            for fn in (bench_flagship_trainer,
                       lambda: bench_flagship_trainer("slots"),
                       bench_ppo_trainer, bench_es_trainer):
                r = _apply_floor(fn())
                any_regressed |= r.get("regressed", False)
                print(json.dumps(r), file=sys.stderr, flush=True)
        headline = results["ram"]
        # headline verdict covers EVERY metric measured this run
        headline["regressed"] = any_regressed
    else:
        headline = _apply_floor(
            bench_one(args.obs, args.batch, args.steps, args.chunk,
                      args.impl, args.acc, args.profile_dir))
        print(json.dumps(headline["_detail"]), file=sys.stderr)

    headline.pop("_detail", None)
    print(json.dumps(headline), flush=True)


if __name__ == "__main__":
    main()
