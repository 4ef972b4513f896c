"""Parity for the standalone public surface: ``TetrisEngine`` (the tetrisRL-
style engine class, tetris_env.py:125-335) and the module-level
``convert_grayscale`` / ``convert_grayscale_rgb`` host functions (:76-122),
each lockstepped / compared against the reference loaded in place."""

from __future__ import annotations

import numpy as np
import pytest

from reference_oracle import (OracleEngine, load_reference_module,
                              reference_available)
from gym_simpletetris_tpu import (TetrisEngine, convert_grayscale,
                                  convert_grayscale_rgb)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")


def run_lockstep(n_steps: int, seed: int, policy_seed: int = 0,
                 width: int = 10, height: int = 20, **flags):
    ref = OracleEngine(width=width, height=height, seed=seed, **flags)
    eng = TetrisEngine(width, height, **flags)
    rng = np.random.RandomState(policy_seed)

    _, draws = ref.clear()
    assert len(draws) == 1
    eng.clear(injected_r=draws[0])
    assert ref.info() == eng.get_info()

    for t in range(n_steps):
        a = int(rng.randint(0, 7))
        (rboard, rrew, rdone), draws = ref.step(a)
        jboard, jrew, jdone = eng.step(a, injected_r=draws[0] if draws else 0)
        np.testing.assert_array_equal((rboard != 0).astype(np.uint8),
                                      (jboard != 0).astype(np.uint8),
                                      err_msg=f"board mismatch at t={t}")
        assert float(rrew) == jrew and bool(rdone) == jdone, f"t={t}"
        assert ref.info() == eng.get_info(), f"info mismatch at t={t}"
        # attribute surface (anchor compared int-coerced; the reference holds
        # the float spawn anchor until its next step coerces it, :196/:244)
        e = ref.engine
        assert (int(e.anchor[0]), int(e.anchor[1])) == eng.anchor
        assert e.shape_name == eng.shape_name
        assert sorted(map(tuple, e.shape)) == sorted(eng.shape)
        assert dict(e.shape_counts) == eng.shape_counts
        np.testing.assert_array_equal((ref.render() != 0).astype(np.uint8),
                                      (eng.render() != 0).astype(np.uint8))
        if rdone:
            _, draws = ref.clear()
            eng.clear(injected_r=draws[0])
            assert ref.info() == eng.get_info()


def test_lockstep_default():
    run_lockstep(300, seed=42)


def test_lockstep_flags_and_geometry():
    run_lockstep(200, seed=7, policy_seed=1, width=9, height=14,
                 reward_step=True, advanced_clears=True, penalise_holes=True)
    run_lockstep(200, seed=8, policy_seed=2, width=6, height=8,
                 lock_delay=2, step_reset=True, penalise_height=True)


def test_preclear_state_matches_reference_init():
    """Before clear(): time == score == -1, empty board, no piece
    (tetris_env.py:163-172); step() raises like the reference's None-anchor
    coercion (:244)."""
    eng = TetrisEngine(10, 20)
    assert eng.time == -1 and eng.score == -1
    assert eng.anchor is None and eng.shape is None and eng.shape_name is None
    assert eng.holes == 0 and eng.n_deaths == 0 and eng.lines_cleared == 0
    assert eng.shape_counts == {n: 0 for n in "TJLZSIO"}
    np.testing.assert_array_equal(eng.board, np.zeros((10, 20)))
    assert eng.nb_actions == 7
    assert eng._scoring["reward_step"] is False
    with pytest.raises(TypeError):
        eng.step(0)
    with pytest.raises(TypeError):
        eng.valid_action_count()


def test_carry_over_and_repr_and_vac():
    ref = OracleEngine(width=8, height=6, seed=3)
    eng = TetrisEngine(8, 6)
    _, draws = ref.clear()
    eng.clear(injected_r=draws[0])
    dead = 0
    for t in range(200):
        a = 2 if t % 3 else 5  # drop-heavy: force deaths on the tiny board
        (rb, rr, rd), draws = ref.step(a)
        jb, jr, jd = eng.step(a, injected_r=draws[0] if draws else 0)
        assert repr(ref.engine) == repr(eng)
        if isinstance(ref.engine.anchor[0], int):
            assert ref.valid_action_count() == eng.valid_action_count()
        if rd:
            dead += 1
            assert eng.n_deaths == ref.engine.n_deaths
            _, draws = ref.clear()
            eng.clear(injected_r=draws[0])
            # clear() carries deaths/shape_counts/_lock_delay (:306-315)
            assert ref.info() == eng.get_info()
            assert eng._lock_delay == ref.engine._lock_delay
    assert dead >= 3 and eng.n_deaths == dead


def test_board_assignment_roundtrips():
    eng = TetrisEngine(10, 20)
    eng.clear(injected_r=1)
    b = eng.board
    b[3, 19] = 1.0
    b[0, 10] = 1.0
    eng.board = b
    np.testing.assert_array_equal(eng.board, b)
    with pytest.raises(ValueError):
        eng.board = np.zeros((5, 5))


# -- convert_grayscale / convert_grayscale_rgb ---------------------------------

@pytest.mark.parametrize("shape,size", [
    ((10, 20), 84), ((10, 20), 160), ((10, 20), 512),
    ((4, 5), 84), ((9, 13), 160), ((20, 10), 84), ((7, 7), 84),
])
def test_convert_grayscale_matches_reference(shape, size):
    mod = load_reference_module()
    rng = np.random.RandomState(size + shape[0])
    board = (rng.rand(*shape) < 0.4).astype(float)
    np.testing.assert_array_equal(mod.convert_grayscale(board, size),
                                  convert_grayscale(board, size))


def test_convert_grayscale_value_passthrough_quirk():
    """Only 0 and 1 are remapped (tetris_env.py:96-97): any other value is the
    pixel shade verbatim, floats truncate through the uint8 cast (:81)."""
    mod = load_reference_module()
    board = np.array([[0, 1, 2], [50, 190, 255], [128, 3.9, 0.2]], dtype=float)
    ref = mod.convert_grayscale(board, 84)
    ours = convert_grayscale(board, 84)
    np.testing.assert_array_equal(ref, ours)
    assert set(np.unique(ours)) >= {0, 128, 190, 2, 50, 255, 3}


def test_convert_grayscale_rgb_matches_reference():
    mod = load_reference_module()
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(84, 84), dtype=np.uint8)
    np.testing.assert_array_equal(mod.convert_grayscale_rgb(img),
                                  convert_grayscale_rgb(img))
    assert convert_grayscale_rgb(img).shape == (84, 84, 3)


def test_render_unknown_mode_falls_through():
    """Unknown render modes delegate to gym.Env.render like the reference
    (tetris_env.py:463-464) — which itself raises NotImplementedError in the
    old gym API."""
    from gym_simpletetris_tpu import TetrisEnv
    load_reference_module()  # ensures a gym module (stub or real) exists
    env = TetrisEnv()
    env.reset()
    with pytest.raises(NotImplementedError):
        env.render(mode="definitely_not_a_mode")
