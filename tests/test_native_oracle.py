"""Native C++ engine (gym_simpletetris_tpu/native): validation and mass fuzz.

Trust chain (SURVEY.md §4.1 extended):
  1. The C++ engine is cross-validated step-by-step against the in-place-loaded
     Python reference under identical injected draw streams (boards, rewards,
     done, info, valid_action_count) across the scoring-flag matrix.
  2. The JAX engine is then mass-fuzzed against the C++ engine over far longer
     horizons and more configurations than the Python oracle can afford
     (~25k steps/s vs millions) — scan-fused with per-step injected step/clear
     draw streams recorded by the native driver.
"""

from __future__ import annotations

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from reference_oracle import OracleEngine, reference_available
from gym_simpletetris_tpu.core.config import EnvConfig
from gym_simpletetris_tpu.core import engine as E
from gym_simpletetris_tpu.core.state import init_state
from gym_simpletetris_tpu.api.env import _select_done
from gym_simpletetris_tpu.ops.bitops import unpack_board
from gym_simpletetris_tpu.native import native_available

if native_available():
    from gym_simpletetris_tpu.native import NativeTetrisEngine, drive_many

pytestmark = pytest.mark.skipif(
    not native_available(), reason="g++ toolchain unavailable")

FLAG_KEYS = ("lock_delay", "step_reset", "reward_step", "penalise_height",
             "penalise_height_increase", "advanced_clears", "high_scoring",
             "penalise_holes", "penalise_holes_increase")


def _flags(cfg: EnvConfig) -> dict:
    return {k: getattr(cfg, k) for k in FLAG_KEYS}


# --------------------------------------------------------- C++ vs Python reference

CROSS_CONFIGS = [
    EnvConfig(),
    EnvConfig(reward_step=True, advanced_clears=True, lock_delay=2),
    EnvConfig(penalise_height=True, penalise_holes=True, step_reset=True),
    EnvConfig(penalise_height_increase=True, penalise_holes_increase=True,
              high_scoring=True, lock_delay=1),
    EnvConfig(width=9, height=12),   # odd width: float-anchor spawn truncation
    EnvConfig(width=4, height=5, reward_step=True),  # tiny board, rapid deaths
]


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
@pytest.mark.parametrize("cfg", CROSS_CONFIGS,
                         ids=lambda c: f"w{c.width}h{c.height}ld{c.lock_delay}")
def test_cpp_matches_python_reference(cfg):
    """Step-by-step bitwise equality, replaying the reference's draws into C++."""
    ref = OracleEngine(width=cfg.width, height=cfg.height, seed=7, **_flags(cfg))
    nat = NativeTetrisEngine(width=cfg.width, height=cfg.height, **_flags(cfg))

    rboard, draws = ref.clear()
    nboard, _ = nat.clear(draws[0])
    np.testing.assert_array_equal((rboard != 0).astype(np.uint8), nboard)
    assert ref.info() == nat.info()

    rng = np.random.RandomState(123)
    for t in range(300):
        a = int(rng.randint(0, 7))
        (rb, rr, rd), d = ref.step(a)
        (nb, nr, nd), _ = nat.step(a, d[0] if d else 0)
        np.testing.assert_array_equal((rb != 0).astype(np.uint8), nb,
                                      err_msg=f"board t={t} cfg={cfg}")
        assert float(rr) == nr, (t, rr, nr)
        assert bool(rd) == nd, (t, rd, nd)
        assert ref.info() == nat.info(), t
        if isinstance(ref.engine.anchor[0], int):
            # reference vac float-indexes numpy right after spawn (see
            # test_parity_engine.py) — only compare once int-coerced
            assert ref.valid_action_count() == nat.valid_action_count(), t
        if rd:
            _, d = ref.clear()
            nat.clear(d[0])
            assert ref.info() == nat.info()


def test_drive_matches_stepwise():
    """The batch driver must be an exact fusion of step()/clear() calls."""
    a = NativeTetrisEngine(seed=5)
    b = NativeTetrisEngine(seed=5)
    a.clear()
    b.clear()
    rng = np.random.RandomState(0)
    actions = rng.randint(0, 7, size=400)
    boards, rewards, dones, r_step, r_clear = a.drive(actions, auto_clear=True)
    for t, act in enumerate(actions):
        (bb, br, bd), r_used = b.step(int(act))
        np.testing.assert_array_equal(boards[t], bb, err_msg=f"t={t}")
        assert rewards[t] == np.float32(br)
        assert bool(dones[t]) == bd
        assert r_step[t] == r_used
        if bd:
            _, rc = b.clear()
            assert r_clear[t] == rc
        else:
            assert r_clear[t] == 0
    assert a.info() == b.info()


def test_native_checkpoint_resume_bit_identical():
    """save_state/load_state must resume the exact trajectory (board, rewards,
    RNG stream, carry-over counters)."""
    g = NativeTetrisEngine(seed=33, advanced_clears=True, lock_delay=1)
    g.clear()
    rng = np.random.RandomState(4)
    acts = rng.randint(0, 7, 500).astype(np.int32)
    for a in acts[:200]:
        (b, r, d), _ = g.step(int(a))
        if d:
            g.clear()
    snap = g.save_state()
    tail_a = g.drive(acts[200:], auto_clear=True)

    h = NativeTetrisEngine(seed=999, advanced_clears=True, lock_delay=1)
    h.load_state(snap)
    tail_b = h.drive(acts[200:], auto_clear=True)
    for x, y in zip(tail_a, tail_b):
        np.testing.assert_array_equal(x, y)
    assert g.info() == h.info()

    wrong = NativeTetrisEngine(width=6, height=8)
    with pytest.raises(ValueError):
        wrong.load_state(snap)
    # same byte size but transposed geometry / different flags: header check
    transposed = NativeTetrisEngine(width=20, height=10)
    with pytest.raises(ValueError, match="header"):
        transposed.load_state(snap)
    wrong_flags = NativeTetrisEngine(advanced_clears=True, lock_delay=2)
    with pytest.raises(ValueError, match="header"):
        wrong_flags.load_state(snap)


def test_drive_many_matches_single_games():
    """The threaded batch driver must equal per-game drive() exactly."""
    n, t = 9, 300
    rng = np.random.RandomState(2)
    actions = rng.randint(0, 7, size=(n, t)).astype(np.int32)
    seeds = 50 + np.arange(n, dtype=np.uint64)
    out = drive_many(actions, seeds, threads=4, advanced_clears=True)
    for i in range(n):
        g = NativeTetrisEngine(seed=int(seeds[i]), advanced_clears=True)
        _, r0 = g.clear()
        assert out["r0"][i] == r0
        bb, rr, dd, rs, rc = g.drive(actions[i], auto_clear=True)
        np.testing.assert_array_equal(out["boards"][i], bb)
        np.testing.assert_array_equal(out["rewards"][i], rr)
        np.testing.assert_array_equal(out["dones"][i], dd)
        np.testing.assert_array_equal(out["r_step"][i], rs)
        np.testing.assert_array_equal(out["r_clear"][i], rc)
        inf = g.info()
        assert out["deaths"][i] == inf["deaths"]
        assert list(out["counts"][i]) == list(inf["statistics"].values())
    with pytest.raises(TypeError):
        drive_many(actions, seeds, bogus_flag=True)


# --------------------------------------------------------------- JAX vs C++ fuzz

FUZZ_CONFIGS = [
    EnvConfig(),
    EnvConfig(reward_step=True, advanced_clears=True, lock_delay=2,
              step_reset=True),
    EnvConfig(penalise_height=True, penalise_holes=True),
    EnvConfig(penalise_height_increase=True, penalise_holes_increase=True,
              high_scoring=True, lock_delay=3),
    EnvConfig(width=9, height=12, advanced_clears=True),
    EnvConfig(width=5, height=6, reward_step=True, lock_delay=1),
    EnvConfig(width=24, height=20),      # packed-engine width boundary
    EnvConfig(width=10, height=20, lock_delay=5, step_reset=True,
              penalise_height=True, penalise_holes_increase=True),
    EnvConfig(width=16, height=5, high_scoring=True),  # shallow board
    EnvConfig(width=4, height=32, reward_step=True,
              penalise_height_increase=True),          # deep narrow board
]


@pytest.mark.parametrize("ci", range(len(FUZZ_CONFIGS)))
def test_fuzz_jax_vs_cpp(ci):
    """Scan-fused mass fuzz: B envs x T steps of bitwise lockstep per config.

    ~25x the per-config step count of the Python-oracle fuzz
    (test_parity_fuzz.py) at a fraction of its wall time.
    """
    cfg = FUZZ_CONFIGS[ci]
    B, T = 64, 512
    rng = np.random.RandomState(1000 + ci)
    actions = rng.randint(0, 7, size=(T, B)).astype(np.int32)

    # -- native side: B independent games in parallel C++ threads ---------------
    seeds = 777 * (ci + 1) + np.arange(B, dtype=np.uint64)
    out = drive_many(actions.T, seeds, width=cfg.width, height=cfg.height,
                     **_flags(cfg))
    boards_n = np.transpose(out["boards"], (1, 0, 2, 3))   # [T, B, W, H]
    rewards_n, dones_n = out["rewards"].T, out["dones"].T
    r_step, r_clear = out["r_step"].T, out["r_clear"].T
    r0 = out["r0"]

    # -- JAX side: one scan over the injected streams ---------------------------
    state = init_state(cfg, B, jax.random.PRNGKey(ci))
    state, _ = jax.jit(lambda s, r: E.engine_clear(cfg, s, injected_r=r))(
        state, jnp.asarray(r0))

    def body(st, xs):
        a, rs, rc = xs
        out = E.engine_step(cfg, st, a, injected_r=rs)
        cleared, _ = E.engine_clear(cfg, out.state, injected_r=rc)
        st = _select_done(out.done, cleared, out.state)
        return st, (out.emitted_rows, out.reward, out.done)

    xs = (jnp.asarray(actions), jnp.asarray(r_step), jnp.asarray(r_clear))
    final_state, (emitted, reward, done) = jax.jit(
        lambda s, xs: jax.lax.scan(body, s, xs))(state, xs)

    boards_j = np.asarray(
        jax.vmap(lambda e: unpack_board(cfg, e, dtype=jnp.uint8))(emitted))
    np.testing.assert_array_equal(boards_j, boards_n, err_msg=f"cfg={cfg}")
    np.testing.assert_array_equal(np.asarray(reward), rewards_n)
    np.testing.assert_array_equal(np.asarray(done).astype(np.uint8), dones_n)

    # cross-episode carry-over state at the end of the run
    np.testing.assert_array_equal(np.asarray(final_state.deaths),
                                  out["deaths"])
    np.testing.assert_array_equal(np.asarray(final_state.shape_counts).T,
                                  out["counts"])
