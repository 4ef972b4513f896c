"""Property tests for the constant piece/rotation tables (SURVEY.md §4.2)."""

import numpy as np
import pytest

from gym_simpletetris_tpu.core import pieces as P


def _cellset(offsets):
    return frozenset(map(tuple, offsets.tolist()))


def test_rotation_period_four():
    # rotated() applied 4x is the identity (verified property of the reference map)
    for p in range(P.NUM_PIECES):
        cells = tuple(map(tuple, P.OFFSETS[p, 0].tolist()))
        out = cells
        for _ in range(4):
            out = P.rotate_cw(out)
        assert out == cells


def test_rotation_ring_consistency():
    for p in range(P.NUM_PIECES):
        for r in range(P.NUM_ROTS):
            cells = tuple(map(tuple, P.OFFSETS[p, r].tolist()))
            nxt = tuple(map(tuple, P.OFFSETS[p, (r + 1) % 4].tolist()))
            assert P.rotate_cw(cells) == nxt


def test_every_rotation_contains_anchor_cell():
    # (0,0) is in every base shape and is a fixed point of the rotation map;
    # the engine's shift-bound analysis relies on this.
    for p in range(P.NUM_PIECES):
        for r in range(P.NUM_ROTS):
            assert (0, 0) in _cellset(P.OFFSETS[p, r])


def test_offsets_within_pm3():
    assert P.OFFSETS.min() >= -3 and P.OFFSETS.max() <= 3


def test_rowmasks_match_offsets():
    for p in range(P.NUM_PIECES):
        for r in range(P.NUM_ROTS):
            expect = np.zeros(P.NROWS, dtype=np.uint32)
            for dx, dy in P.OFFSETS[p, r].tolist():
                expect[dy + P.DY_OFF] |= np.uint32(1) << np.uint32(dx + P.DX_OFF)
            np.testing.assert_array_equal(P.ROWMASKS[p, r], expect)
            np.testing.assert_array_equal(P.ROWMASKS_FLAT[p * 4 + r], expect)


def test_each_piece_has_four_cells():
    for p in range(P.NUM_PIECES):
        for r in range(P.NUM_ROTS):
            bits = sum(bin(int(m)).count("1") for m in P.ROWMASKS[p, r])
            assert bits == 4, (p, r)


@pytest.mark.skipif(
    not __import__("reference_oracle").reference_available(),
    reason="reference repo not mounted")
def test_base_shapes_match_reference():
    from reference_oracle import load_reference_module
    mod = load_reference_module()
    for p, name in enumerate(P.PIECE_NAMES):
        assert name == mod.shape_names[p]
        assert _cellset(P.OFFSETS[p, 0]) == frozenset(mod.shapes[name])
        # full rotation ring vs reference rotated()
        cells = mod.shapes[name]
        for r in range(4):
            assert _cellset(P.OFFSETS[p, r]) == frozenset(cells)
            cells = mod.rotated(cells, cclk=True)
