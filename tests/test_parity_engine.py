"""Oracle parity: lockstep the JAX engine against the reference TetrisEngine
(loaded in place from /root/reference) under an identical injected RNG stream.

This is the centerpiece test (SURVEY.md §4.1): bitwise-equal board, reward, done,
and info at every step, across the scoring-flag matrix, lock-delay/step_reset
variants, odd widths (float-anchor spawn truncation), small boards, cross-episode
carry-over, and stepping past death (the death-erase quirk)."""

from __future__ import annotations

import numpy as np
import pytest

from reference_oracle import OracleEngine, reference_available
from jax_harness import JaxOneEnv
from gym_simpletetris_tpu.core.config import EnvConfig

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")


def run_lockstep(cfg: EnvConfig, seed: int, n_steps: int, policy_seed: int = 0,
                 reset_on_done: bool = True, steps_past_death: int = 0,
                 check_vac: bool = False):
    flags = dict(
        lock_delay=cfg.lock_delay, step_reset=cfg.step_reset,
        reward_step=cfg.reward_step, penalise_height=cfg.penalise_height,
        penalise_height_increase=cfg.penalise_height_increase,
        advanced_clears=cfg.advanced_clears, high_scoring=cfg.high_scoring,
        penalise_holes=cfg.penalise_holes,
        penalise_holes_increase=cfg.penalise_holes_increase,
    )
    ref = OracleEngine(width=cfg.width, height=cfg.height, seed=seed, **flags)
    jx = JaxOneEnv(cfg)
    rng = np.random.RandomState(policy_seed)

    _, draws = ref.clear()
    assert len(draws) == 1
    jx.clear(draws[0])
    assert ref.info() == jx.info()

    past_death = 0
    for t in range(n_steps):
        a = int(rng.randint(0, 7))
        (rboard, rrew, rdone), draws = ref.step(a)
        assert len(draws) <= 1
        jboard, jrew, jdone = jx.step(a, draws[0] if draws else 0)

        np.testing.assert_array_equal(
            (rboard != 0).astype(np.uint8), jboard.astype(np.uint8),
            err_msg=f"board mismatch at t={t} action={a} cfg={cfg}")
        assert float(rrew) == jrew, f"reward mismatch at t={t}: {rrew} vs {jrew}"
        assert bool(rdone) == jdone, f"done mismatch at t={t}"
        ri, ji = ref.info(), jx.info()
        assert ri == ji, f"info mismatch at t={t}: {ri} vs {ji}"
        if check_vac and isinstance(ref.engine.anchor[0], int):
            # The reference's valid_action_count float-indexes numpy and crashes
            # while the anchor is the float spawn anchor (tetris_env.py:196,227);
            # only compare on steps where its anchor has been int-coerced.
            assert ref.valid_action_count() == jx.valid_action_count(), f"vac t={t}"

        if rdone:
            if past_death < steps_past_death:
                past_death += 1
                continue
            past_death = 0
            if reset_on_done:
                _, draws = ref.clear()
                jx.clear(draws[0])
                assert ref.info() == jx.info()


def test_default_config_long():
    run_lockstep(EnvConfig(), seed=42, n_steps=400)


def test_default_trace_seed_42_matches_survey():
    """Golden anchor from SURVEY.md §2.5: seed 42, spawn order starts J T Z ..."""
    ref = OracleEngine(seed=42)
    _, draws = ref.clear()
    jx = JaxOneEnv(EnvConfig())
    jx.clear(draws[0])
    assert jx.info()["current_piece"] == "J"


@pytest.mark.parametrize("flag", [
    "reward_step", "penalise_height", "penalise_height_increase",
    "advanced_clears", "high_scoring", "penalise_holes",
    "penalise_holes_increase",
])
def test_each_scoring_flag(flag):
    run_lockstep(EnvConfig(**{flag: True}), seed=7, n_steps=250, policy_seed=1)


def test_flag_combinations():
    run_lockstep(
        EnvConfig(reward_step=True, penalise_height=True, penalise_holes=True,
                  advanced_clears=True),
        seed=3, n_steps=250, policy_seed=2)
    run_lockstep(
        EnvConfig(penalise_height_increase=True, penalise_holes_increase=True,
                  high_scoring=True),
        seed=4, n_steps=250, policy_seed=3)
    # elif precedence: both height flags / both holes flags set
    run_lockstep(
        EnvConfig(penalise_height=True, penalise_height_increase=True,
                  penalise_holes=True, penalise_holes_increase=True),
        seed=5, n_steps=200, policy_seed=4)
    # advanced_clears shadows high_scoring (elif, tetris_env.py:266-270)
    run_lockstep(EnvConfig(advanced_clears=True, high_scoring=True),
                 seed=6, n_steps=200, policy_seed=5)


@pytest.mark.parametrize("lock_delay,step_reset", [
    (1, False), (1, True), (2, False), (2, True), (5, False), (5, True),
])
def test_lock_delay_variants(lock_delay, step_reset):
    run_lockstep(EnvConfig(lock_delay=lock_delay, step_reset=step_reset),
                 seed=11, n_steps=300, policy_seed=lock_delay * 2 + step_reset)


@pytest.mark.parametrize("width,height",
                         [(4, 5), (9, 20), (10, 20), (16, 8), (7, 7), (24, 8)])
def test_board_geometries(width, height):
    # odd widths exercise the float-anchor spawn truncation (tetris_env.py:196,244)
    run_lockstep(EnvConfig(width=width, height=height), seed=13,
                 n_steps=200, policy_seed=width)


def test_steps_past_death_erase_quirk():
    """Stepping past done: the locked piece's cells are force-erased from the
    persistent board at emission (tetris_env.py:301-303)."""
    run_lockstep(EnvConfig(), seed=17, n_steps=200, policy_seed=6,
                 reset_on_done=True, steps_past_death=5)


def test_valid_action_count_parity():
    run_lockstep(EnvConfig(), seed=19, n_steps=120, policy_seed=7, check_vac=True)


def test_hard_drop_spam_small_board():
    """SURVEY.md §2.5 anchor: 4x5 board, hard-drop only."""
    cfg = EnvConfig(width=4, height=5)
    ref = OracleEngine(width=4, height=5, seed=1)
    jx = JaxOneEnv(cfg)
    _, draws = ref.clear()
    jx.clear(draws[0])
    for t in range(20):
        (rboard, rrew, rdone), draws = ref.step(2)
        jboard, jrew, jdone = jx.step(2, draws[0] if draws else 0)
        np.testing.assert_array_equal((rboard != 0).astype(np.uint8),
                                      jboard.astype(np.uint8))
        assert float(rrew) == jrew and bool(rdone) == jdone
        if rdone:
            _, draws = ref.clear()
            jx.clear(draws[0])
