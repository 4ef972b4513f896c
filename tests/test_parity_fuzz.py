"""Randomized parity fuzzing: random configs x random action scripts, lockstep
vs the reference oracle. The checked-in default is moderate; set
``TETRIS_FUZZ_CASES`` to scale up (used for long offline fuzz sweeps)."""

import os

import numpy as np
import pytest

from reference_oracle import reference_available
from test_parity_engine import run_lockstep
from gym_simpletetris_tpu.core.config import EnvConfig

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")

N_CASES = int(os.environ.get("TETRIS_FUZZ_CASES", "6"))
N_STEPS = int(os.environ.get("TETRIS_FUZZ_STEPS", "150"))


def _random_config(rng) -> EnvConfig:
    return EnvConfig(
        width=int(rng.choice([4, 5, 7, 9, 10, 13, 16, 24])),
        height=int(rng.choice([5, 7, 10, 20, 24])),
        lock_delay=int(rng.choice([0, 0, 1, 2, 5])),
        step_reset=bool(rng.randint(2)),
        reward_step=bool(rng.randint(2)),
        penalise_height=bool(rng.randint(2)),
        penalise_height_increase=bool(rng.randint(2)),
        advanced_clears=bool(rng.randint(2)),
        high_scoring=bool(rng.randint(2)),
        penalise_holes=bool(rng.randint(2)),
        penalise_holes_increase=bool(rng.randint(2)),
    )


@pytest.mark.parametrize("case", range(N_CASES))
def test_fuzz_parity(case):
    rng = np.random.RandomState(1000 + case)
    cfg = _random_config(rng)
    run_lockstep(cfg, seed=int(rng.randint(1 << 30)), n_steps=N_STEPS,
                 policy_seed=int(rng.randint(1 << 30)),
                 steps_past_death=int(rng.choice([0, 3])))
