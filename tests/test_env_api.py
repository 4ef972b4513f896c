"""API-surface tests for the vector env, registry, spaces, auto-reset, rollout."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_simpletetris_tpu import (
    EnvConfig, TetrisVectorEnv, make, PIECE_NAMES)


def test_vector_env_shapes():
    env = TetrisVectorEnv(EnvConfig(obs_type="grayscale"), batch_size=3)
    obs, state = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (3, 84, 84) and obs.dtype == jnp.float32
    a = jnp.zeros(3, jnp.int32)
    obs, state, rew, done, info = env.step(state, a)
    assert obs.shape == (3, 84, 84)
    assert rew.shape == (3,) and rew.dtype == jnp.float32
    assert done.shape == (3,) and done.dtype == jnp.bool_
    assert info["statistics"].shape == (3, 7)
    assert set(info) == {"time", "current_piece", "score", "lines_cleared",
                         "holes", "deaths", "statistics", "lines_delta"}
    assert info["lines_delta"].shape == (3,)


def test_obs_values_are_reference_palette():
    env = TetrisVectorEnv(EnvConfig(obs_type="grayscale"), batch_size=2)
    obs, state = env.reset(jax.random.PRNGKey(1))
    obs, *_ = env.step(state, jnp.zeros(2, jnp.int32))
    vals = set(np.unique(np.asarray(obs)).tolist())
    assert vals <= {0.0, 128.0, 190.0}


def test_auto_reset():
    cfg = EnvConfig(width=4, height=5, auto_reset=True)
    env = TetrisVectorEnv(cfg, batch_size=8)
    obs, state = env.reset(jax.random.PRNGKey(2))
    deaths = 0
    rng = np.random.RandomState(0)
    for t in range(60):
        a = jnp.asarray(rng.randint(0, 7, 8))
        obs, state, rew, done, info = env.step(state, a)
        if bool(done.any()):
            deaths += int(done.sum())
            # auto-reset: done envs get the reset obs (empty board) and
            # a fresh episode (time==0), deaths counter carried over
            i = int(np.argmax(np.asarray(done)))
            assert float(np.asarray(obs[i]).sum()) == 0.0
            assert int(state.time[i]) == 0
    assert deaths > 0
    assert int(state.deaths.sum()) == deaths


def test_rollout_scan():
    cfg = EnvConfig(auto_reset=True, obs_type="ram")
    env = TetrisVectorEnv(cfg, batch_size=16)
    obs, state = env.reset(jax.random.PRNGKey(3))
    actions = jax.random.randint(jax.random.PRNGKey(4), (50, 16), 0, 7)
    final, acc, rew, done = env.rollout(state, actions)
    assert rew.shape == (50, 16) and done.shape == (50, 16)
    assert acc.shape == (16,) + env.observation_space.shape
    assert int(final.time.max()) > 0
    # engine-only variant
    final2, acc2, rew2, done2 = env.rollout(state, actions, with_obs=False)
    np.testing.assert_array_equal(np.asarray(rew), np.asarray(rew2))


@pytest.mark.parametrize("obs_type", ["ram", "grayscale", "rgb"])
def test_rollout_matches_sequential_steps(obs_type):
    """Drift guard: build_rollout's storage-mode scan body reimplements the
    step (engine + auto-reset) to accumulate the storage obs — it must stay
    bitwise equal to sequential step_fn calls (rewards, dones, final state)
    and its accumulator must equal the sum of the per-step storage
    observations, for both acc modes."""
    from gym_simpletetris_tpu.api.env import (build_observation_storage,
                                              step_fn)
    from gym_simpletetris_tpu.core import engine as E
    from gym_simpletetris_tpu.api.env import apply_reset_mask

    cfg = EnvConfig(auto_reset=True, obs_type=obs_type, reward_step=True,
                    width=6, height=8)   # small board: deaths inside horizon
    env = TetrisVectorEnv(cfg, batch_size=8)
    obs, state0 = env.reset(jax.random.PRNGKey(5))
    T = 40
    actions = jax.random.randint(jax.random.PRNGKey(6), (T, 8), 0, 7)

    for acc_mode in ("storage", "delivered"):
        final, acc, rew, done = env.rollout(state0, actions,
                                            acc_mode=acc_mode)
        st = state0
        accs = None
        rews, dones = [], []
        for t in range(T):
            o = E.engine_step(cfg, st, actions[t])
            st, emitted = o.state, o.emitted_rows
            st, emitted = apply_reset_mask(cfg, st, emitted, o.done)
            s = build_observation_storage(cfg, emitted)
            if acc_mode == "delivered":
                from gym_simpletetris_tpu.api.env import obs_from_storage
                s = obs_from_storage(cfg, s)
            accs = s if accs is None else accs + s
            rews.append(np.asarray(o.reward))
            dones.append(np.asarray(o.done))
        np.testing.assert_array_equal(np.asarray(rew), np.stack(rews))
        np.testing.assert_array_equal(np.asarray(done), np.stack(dones))
        np.testing.assert_array_equal(np.asarray(final.rows),
                                      np.asarray(st.rows))
        np.testing.assert_array_equal(np.asarray(final.key),
                                      np.asarray(st.key))
        np.testing.assert_array_equal(np.asarray(acc), np.asarray(accs))


def test_make_registry():
    env = make("SimpleTetris-v0", obs_type="ram")
    obs = env.reset()
    assert obs.shape == (10, 20)
    obs, rew, done, info = env.step(env.action_space.sample())
    assert isinstance(info["statistics"], dict)
    venv = make("SimpleTetris-v0", batch_size=4)
    assert venv.batch_size == 4
    with pytest.raises(KeyError):
        make("Nope-v0")


def test_gym_compat_step_before_reset_raises():
    env = make("SimpleTetris-v0")
    with pytest.raises(RuntimeError):
        env.step(0)


def test_gym_compat_repr_ascii():
    env = make("SimpleTetris-v0", width=6, height=7)
    env.reset()
    env.step(6)
    s = repr(env)
    lines = s.splitlines()
    assert lines[0] == "o" + "-" * 6 + "o" and len(lines) == 9


def test_spaces_match_reference_declarations():
    for obs_type, extend, shape in [
        ("ram", False, (10, 20)), ("ram", True, (10, 20, 1)),
        ("grayscale", False, (84, 84)), ("grayscale", True, (84, 84, 1)),
        ("rgb", False, (84, 84, 3)), ("rgb", True, (84, 84, 3)),
    ]:
        env = make("SimpleTetris-v0", obs_type=obs_type, extend_dims=extend)
        assert env.observation_space.shape == shape, (obs_type, extend)
        assert env.action_space.n == 7


def test_gymnasium_registration():
    gymnasium = pytest.importorskip("gymnasium")
    from gym_simpletetris_tpu import register_gymnasium
    register_gymnasium("SimpleTetrisTPU-test-v0")
    env = gymnasium.make("SimpleTetrisTPU-test-v0")
    obs, info = env.reset()
    assert obs.shape == (10, 20)
    obs, reward, terminated, truncated, info = env.step(6)
    assert truncated is False and isinstance(info["statistics"], dict)


def test_piece_names_export():
    assert PIECE_NAMES == ("T", "J", "L", "Z", "S", "I", "O")


def test_engine_view_attributes():
    """env.engine exposes the reference TetrisEngine attribute surface."""
    env = make("SimpleTetris-v0", width=6, height=8)
    env.reset()
    eng = env.engine
    assert eng.board.shape == (6, 8)
    assert isinstance(eng.anchor, tuple) and len(eng.anchor) == 2
    assert eng.shape_name in PIECE_NAMES
    assert len(eng.shape) == 4 and all(len(c) == 2 for c in eng.shape)
    assert sum(eng.shape_counts.values()) == 1
    assert eng.time == 0 and eng.score == 0 and eng.n_deaths == 0
    env.step(2)
    assert eng.render().shape == (6, 8)     # board WITH piece burned in
    assert eng.valid_action_count() >= 0
    assert eng.get_info()["time"] == 1
