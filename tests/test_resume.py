"""Kill-and-resume: checkpointed training continues exactly where it stopped.

The failure-recovery story SURVEY.md §5 promises: the whole train state
(params, optimizer, replay ring, env batch, RNG key, counters) is one pytree,
so a checkpoint + ``--resume`` must reproduce the uninterrupted run exactly —
identical subsequent metrics, not merely similar ones.
"""

from __future__ import annotations

import json

import numpy as np
import pytest


def _dqn_args(tmp, total, ckpt_every, extra=()):
    return ["--num-envs", "16", "--width", "6", "--height", "8",
            "--buffer", "256", "--learn-batch", "16", "--learn-starts", "32",
            "--chunk", "8", "--total-steps", str(total),
            "--ckpt", str(tmp / "ckpt"), "--ckpt-every", str(ckpt_every),
            "--log-jsonl", str(tmp / "log.jsonl")] + list(extra)


def _read_jsonl(path):
    return [json.loads(l) for l in open(path)
            if l.strip() and "resumed_from" not in l]


@pytest.mark.parametrize(
    "extra",
    [(), ("--prioritized", "--n-step", "2"),
     ("--prioritized", "--n-step", "2", "--frame-stack", "3",
      "--obs", "grayscale", "--replay-layout", "obs-ring"),
     ("--n-step", "2", "--frame-stack", "3", "--obs", "grayscale",
      "--replay-layout", "frame-ring")],
    ids=["plain", "per_nstep", "obs_ring", "frame_ring"])
def test_dqn_kill_and_resume_identical_metrics(tmp_path, extra):
    from gym_simpletetris_tpu.train.run_dqn import main

    # golden: one uninterrupted 64-step run
    gold = tmp_path / "gold"
    gold.mkdir()
    main(_dqn_args(gold, 64, 1 << 30, extra))
    golden = _read_jsonl(gold / "log.jsonl")

    # interrupted: run to 32 (checkpointing every 16), "crash", resume to 64
    part = tmp_path / "part"
    part.mkdir()
    main(_dqn_args(part, 32, 16, extra))
    main(_dqn_args(part, 64, 16, extra) + ["--resume"])
    resumed = _read_jsonl(part / "log.jsonl")

    assert len(golden) == len(resumed) == 8
    skip = {"wall_s", "sps"}
    for g, r in zip(golden, resumed):
        assert g["actor_steps"] == r["actor_steps"]
        for k in g:
            if k in skip:
                continue
            np.testing.assert_allclose(
                g[k], r[k], rtol=0, atol=0,
                err_msg=f"metric {k} diverged at step {g['actor_steps']}")


def test_ppo_kill_and_resume_identical_metrics(tmp_path):
    from gym_simpletetris_tpu.train.run_ppo import main

    args = ["--num-envs", "16", "--width", "6", "--height", "8",
            "--rollout-len", "8", "--minibatches", "2", "--epochs", "1"]

    gold = tmp_path / "gold"
    gold.mkdir()
    main(args + ["--updates", "6", "--ckpt", str(gold / "c"),
                 "--log-jsonl", str(gold / "log.jsonl")])
    golden = _read_jsonl(gold / "log.jsonl")

    part = tmp_path / "part"
    part.mkdir()
    main(args + ["--updates", "3", "--ckpt", str(part / "c"),
                 "--log-jsonl", str(part / "log.jsonl")])
    main(args + ["--updates", "6", "--ckpt", str(part / "c"), "--resume",
                 "--log-jsonl", str(part / "log.jsonl")])
    resumed = _read_jsonl(part / "log.jsonl")

    assert len(golden) == len(resumed) == 6
    skip = {"wall_s", "sps"}
    for g, r in zip(golden, resumed):
        assert g["update"] == r["update"]
        for k in g:
            if k not in skip:
                np.testing.assert_allclose(
                    g[k], r[k], rtol=0, atol=0,
                    err_msg=f"metric {k} diverged at update {g['update']}")
