"""Golden-trace regression (SURVEY.md §4.3): replay checked-in reference traces
(board hashes, rewards, dones, info scalars, RNG draws) against the JAX engine.
Works without /root/reference mounted — the fixture pins the oracle."""

import hashlib
import json
import os

import numpy as np
import pytest

from jax_harness import JaxOneEnv
from gym_simpletetris_tpu.core.config import EnvConfig

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "golden_traces.json")


def _board_hash(board) -> str:
    bits = (np.asarray(board) != 0).astype(np.uint8)
    return hashlib.sha256(bits.tobytes()).hexdigest()[:16]


def _traces():
    with open(FIXTURE) as f:
        return json.load(f)


@pytest.mark.parametrize("trace", _traces(), ids=lambda t: t["name"])
def test_golden_trace(trace):
    cfg = EnvConfig(width=trace["width"], height=trace["height"],
                    **trace["flags"])
    jx = JaxOneEnv(cfg)
    resets = list(trace["resets"])
    jx.clear(resets.pop(0))
    for t, step in enumerate(trace["steps"]):
        board, reward, done = jx.step(step["action"],
                                      step["r"] if step["r"] is not None else 0)
        assert _board_hash(board) == step["board"], f"{trace['name']} t={t}"
        assert reward == step["reward"], f"{trace['name']} t={t}"
        assert done == step["done"], f"{trace['name']} t={t}"
        info = jx.info()
        assert info["score"] == step["score"]
        assert info["lines_cleared"] == step["lines"]
        assert info["holes"] == step["holes"]
        assert info["deaths"] == step["deaths"]
        assert info["current_piece"] == step["piece"]
        if done:
            jx.clear(resets.pop(0))
