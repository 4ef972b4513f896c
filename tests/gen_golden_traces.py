"""Regenerate tests/fixtures/golden_traces.json from the mounted reference.

Run manually (requires /root/reference): python tests/gen_golden_traces.py
Each trace records config, seed, the action script, every RNG draw, and the
per-step (board_hash, reward, done, info-scalars) — enough for the JAX engine
to be checked bitwise with the reference absent (SURVEY.md §4.3).
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from reference_oracle import OracleEngine  # noqa: E402

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "golden_traces.json")

SCENARIOS = [
    dict(name="default_seed42", seed=42, width=10, height=20, flags={},
         policy_seed=0, steps=300),
    dict(name="all_flags", seed=7, width=10, height=20,
         flags=dict(reward_step=True, penalise_height=True,
                    penalise_holes=True, advanced_clears=True),
         policy_seed=1, steps=300),
    dict(name="lock_delay2_step_reset", seed=11, width=10, height=20,
         flags=dict(lock_delay=2, step_reset=True), policy_seed=2, steps=300),
    dict(name="odd_width_high_scoring", seed=13, width=9, height=12,
         flags=dict(high_scoring=True, penalise_height_increase=True,
                    penalise_holes_increase=True), policy_seed=3, steps=300),
    dict(name="tiny_hard_drop", seed=1, width=4, height=5, flags={},
         policy_seed=4, steps=80, actions="hard_drop"),
]


def board_hash(board) -> str:
    bits = (np.asarray(board) != 0).astype(np.uint8)
    return hashlib.sha256(bits.tobytes()).hexdigest()[:16]


def run_scenario(sc):
    ref = OracleEngine(width=sc["width"], height=sc["height"], seed=sc["seed"],
                       **sc["flags"])
    rng = np.random.RandomState(sc["policy_seed"])
    _, draws0 = ref.clear()
    steps = []
    resets = [int(draws0[0])]
    for t in range(sc["steps"]):
        a = 2 if sc.get("actions") == "hard_drop" else int(rng.randint(0, 7))
        (board, reward, done), draws = ref.step(a)
        info = ref.info()
        steps.append(dict(
            action=a, r=(int(draws[0]) if draws else None),
            board=board_hash(board), reward=float(reward), done=bool(done),
            score=int(info["score"]), lines=int(info["lines_cleared"]),
            holes=int(info["holes"]), deaths=int(info["deaths"]),
            piece=str(info["current_piece"])))
        if done:
            _, draws = ref.clear()
            resets.append(int(draws[0]))
    return dict(
        name=sc["name"], seed=sc["seed"], width=sc["width"],
        height=sc["height"], flags=sc["flags"], steps=steps, resets=resets)


def main():
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    out = [run_scenario(sc) for sc in SCENARIOS]
    with open(FIXTURE, "w") as f:
        json.dump(out, f)
    n = sum(len(t["steps"]) for t in out)
    print(f"wrote {len(out)} traces / {n} steps to {FIXTURE}")


if __name__ == "__main__":
    main()
