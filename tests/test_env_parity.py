"""Obs-level parity: our gym-compat TetrisEnv vs the reference TetrisEnv, driving
the full observation pipeline (ram / grayscale / rgb, extend_dims) in lockstep
with an injected RNG stream."""

import numpy as np
import pytest

from reference_oracle import OracleEnv, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")


def run_env_lockstep(n_steps=120, policy_seed=0, seed=42, **env_kwargs):
    from gym_simpletetris_tpu.api.gym_compat import TetrisEnv

    ref = OracleEnv(seed=seed, **env_kwargs)
    ours = TetrisEnv(**env_kwargs)
    rng = np.random.RandomState(policy_seed)

    robs, draws = ref.reset()
    assert len(draws) == 1
    oobs = ours.reset(injected_r=draws[0])
    np.testing.assert_array_equal(robs, oobs)

    for t in range(n_steps):
        a = int(rng.randint(0, 7))
        (robs, rrew, rdone, rinfo), draws = ref.step(a)
        oobs, orew, odone, oinfo = ours.step(a, injected_r=draws[0] if draws else 0)
        assert robs.dtype == oobs.dtype == np.float32
        assert robs.shape == oobs.shape, f"t={t}: {robs.shape} vs {oobs.shape}"
        np.testing.assert_array_equal(robs, oobs, err_msg=f"obs mismatch t={t}")
        assert float(rrew) == orew and bool(rdone) == odone
        assert rinfo == oinfo, f"info mismatch t={t}: {rinfo} vs {oinfo}"
        if rdone:
            robs, draws = ref.reset()
            oobs = ours.reset(injected_r=draws[0])
            np.testing.assert_array_equal(robs, oobs)


def test_ram_parity():
    run_env_lockstep(obs_type="ram")


def test_ram_extend_dims_parity():
    run_env_lockstep(obs_type="ram", extend_dims=True)


def test_grayscale_parity():
    run_env_lockstep(obs_type="grayscale", n_steps=80)


def test_grayscale_extend_dims_parity():
    run_env_lockstep(obs_type="grayscale", extend_dims=True, n_steps=60)


def test_rgb_parity():
    run_env_lockstep(obs_type="rgb", n_steps=60)


def test_rgb_small_board_with_flags():
    run_env_lockstep(obs_type="rgb", width=9, height=12, advanced_clears=True,
                     reward_step=True, n_steps=80, policy_seed=3)


def test_rgb_array_render_parity():
    from gym_simpletetris_tpu.api.gym_compat import TetrisEnv
    ref = OracleEnv(seed=5)
    ours = TetrisEnv()
    _, draws = ref.reset()
    ours.reset(injected_r=draws[0])
    rng = np.random.RandomState(9)
    for t in range(40):
        a = int(rng.randint(0, 7))
        (_, _, rdone, _), draws = ref.step(a)
        _, _, odone, _ = ours.step(a, injected_r=draws[0] if draws else 0)
        want = ref.env.render(mode="rgb_array")
        got = ours.render(mode="rgb_array")
        np.testing.assert_array_equal(want, got, err_msg=f"render t={t}")
        if rdone:
            _, draws = ref.reset()
            ours.reset(injected_r=draws[0])


def test_rgb_extend_dims_ignored_like_reference():
    # the reference ignores extend_dims for rgb (tetris_env.py:391-392, :433)
    run_env_lockstep(obs_type="rgb", extend_dims=True, n_steps=40)


@pytest.mark.parametrize("case", range(4))
def test_obs_level_fuzz(case):
    """Randomized obs-level lockstep (full TetrisEnv pipeline incl. images)."""
    rng = np.random.RandomState(500 + case)
    kwargs = dict(
        obs_type=["ram", "grayscale", "rgb"][case % 3],
        extend_dims=bool(rng.randint(2)),
        width=int(rng.choice([7, 9, 10, 16])),
        height=int(rng.choice([10, 14, 20])),
        lock_delay=int(rng.choice([0, 1, 2])),
        step_reset=bool(rng.randint(2)),
        reward_step=bool(rng.randint(2)),
        advanced_clears=bool(rng.randint(2)),
        penalise_holes=bool(rng.randint(2)),
    )
    run_env_lockstep(n_steps=60, policy_seed=case, seed=int(rng.randint(1 << 30)),
                     **kwargs)


def test_observation_hook_parity():
    """The de-facto "render obs at a different mode" hook
    (``TetrisEnv._observation(mode=, state=, extend_dims=)``,
    tetris_env.py:413-433): values, dtypes and shapes must match the
    reference for every mode x extend_dims combination, both with the live
    board and with an explicit ``state=``."""
    from gym_simpletetris_tpu.api.gym_compat import TetrisEnv

    ref = OracleEnv(seed=42, obs_type="ram")
    ours = TetrisEnv(obs_type="ram")
    _, draws = ref.reset()
    ours.reset(injected_r=draws[0])
    rng = np.random.RandomState(3)
    for t in range(25):
        a = int(rng.randint(0, 7))
        _, draws = ref.step(a)
        ours.step(a, injected_r=draws[0] if draws else 0)

    for mode in (None, "ram", "grayscale", "rgb"):
        for ext in (None, True, False):
            r = np.asarray(ref.env._observation(mode=mode, extend_dims=ext))
            o = np.asarray(ours._observation(mode=mode, extend_dims=ext))
            assert r.shape == o.shape, (mode, ext, r.shape, o.shape)
            np.testing.assert_array_equal(
                (r != 0) if mode in (None, "ram") else r,
                (o != 0) if mode in (None, "ram") else o,
                err_msg=f"mode={mode} ext={ext}")
    # explicit state= path: a custom board rasterized identically — including
    # the reference's value pass-through quirk (only 0/1 are remapped; other
    # uint8 values become the pixel shade verbatim, tetris_env.py:97-98)
    board = np.zeros((10, 20)); board[3, 19] = 1; board[4, 10] = 1
    board[7, 5] = 2; board[0, 0] = 77
    r = np.asarray(ref.env._observation(mode="grayscale", state=board))
    o = np.asarray(ours._observation(mode="grayscale", state=board))
    np.testing.assert_array_equal(r, o)
    assert r.dtype == o.dtype == np.uint8
    r3 = np.asarray(ref.env._observation(mode="rgb", state=board))
    o3 = np.asarray(ours._observation(mode="rgb", state=board))
    np.testing.assert_array_equal(r3, o3)


def test_seed_in_place_no_rebuild():
    """seed() reseeds without rebuilding the env (same jitted closures, so no
    recompilation) and makes the next reset deterministic."""
    from gym_simpletetris_tpu.api.gym_compat import TetrisEnv
    env = TetrisEnv(obs_type="ram", seed=0)
    venv_before = env._venv
    env.reset()
    env.step(2)
    env.seed(123)
    assert env._venv is venv_before          # no rebuild
    o1 = env.reset()
    i1 = env._get_info()
    env.seed(123)
    o2 = env.reset()
    i2 = env._get_info()
    np.testing.assert_array_equal(o1, o2)
    assert i1 == i2
    # gymnasium adapter rides the same path
    from gym_simpletetris_tpu.api.registry import make_gymnasium_env
    genv = make_gymnasium_env(obs_type="ram")
    inner = genv._env
    ga, _ = genv.reset(seed=7)
    assert genv._env is inner                # reseed did not rebuild
    gb, _ = genv.reset(seed=7)
    np.testing.assert_array_equal(ga, gb)


def test_register_gym_graceful_without_gym():
    """Legacy old-gym registration mirrors the reference's entry point when
    gym is importable, and is a harmless no-op when it is not."""
    from gym_simpletetris_tpu import register_gym
    ok = register_gym()   # must never raise — stubbed/absent/bit-rotted gym
    if ok:  # pragma: no cover - real gym not in this image
        import gym
        assert "SimpleTetris-v0" in gym.envs.registry
    else:
        assert ok is False


def test_primitive_functions():
    """api/primitives.py vs the reference's module-level movement primitives
    (tetris_env.py:39-73): identical (shape, anchor) results over random
    boards/pieces/anchors — including above-board and out-of-range anchors
    (the y<0 collision quirk) — and the shim's value_action_map holds the
    callables like the reference's (tetris_env.py:152-161)."""
    from reference_oracle import load_reference_module
    from gym_simpletetris_tpu.api import primitives as P
    from gym_simpletetris_tpu.api.gym_compat import TetrisEnv
    from gym_simpletetris_tpu.core.pieces import OFFSETS

    mod = load_reference_module()
    pairs = [(P.left, mod.left), (P.right, mod.right),
             (P.soft_drop, mod.soft_drop), (P.hard_drop, mod.hard_drop),
             (P.rotate_left, mod.rotate_left),
             (P.rotate_right, mod.rotate_right), (P.idle, mod.idle)]
    rng = np.random.RandomState(0)
    for trial in range(300):
        w, h = int(rng.randint(4, 12)), int(rng.randint(4, 16))
        board = (rng.rand(w, h) < 0.3).astype(float)
        shape = [tuple(c) for c in
                 OFFSETS[rng.randint(7), rng.randint(4)].tolist()]
        anchor = (int(rng.randint(-2, w + 2)), int(rng.randint(-4, h)))
        for ours, ref in pairs:
            so, ao = ours(list(shape), anchor, board)
            sr, ar = ref(list(shape), anchor, board)
            assert list(so) == list(sr) and tuple(ao) == tuple(ar), \
                (trial, ref.__name__, shape, anchor)

    env = TetrisEnv()
    assert env.value_action_map[2] is P.hard_drop
    assert env.action_value_map[P.rotate_left] == 4
    assert env.nb_actions == 7
