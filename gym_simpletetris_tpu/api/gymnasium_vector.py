"""gymnasium.vector.VectorEnv adapters (new v1 API) over both backends.

The reference never had a vector API (one ``TetrisEnv`` per game,
tetris_env.py:338-467); these adapters expose the framework's batched engines
to gymnasium-ecosystem tooling (vector wrappers, recorders, RL libraries).

gymnasium v1 autoreset convention implemented exactly: when an episode
terminates at step t, step t returns the TERMINAL observation with
``terminated=True``; at step t+1 the env resets instead of stepping — the
provided action is ignored, the reset observation is returned with reward 0
and ``terminated=False``. (The in-framework ``EnvConfig.auto_reset`` uses the
simpler same-step convention; the adapter keeps a pending mask and reconciles.)

``truncations`` are always False: the reference registers no TimeLimit
(gym_simpletetris/__init__.py:3-6).
"""

from __future__ import annotations

import numpy as np

from ..core.config import EnvConfig


def _batched_info(info_arrays: dict) -> dict:
    """gymnasium vector info format: arrays plus per-key presence masks."""
    n = len(next(iter(info_arrays.values())))
    out = {}
    for k, v in info_arrays.items():
        out[k] = np.asarray(v)
        out["_" + k] = np.ones(n, dtype=bool)
    return out


def make_gymnasium_vector_env(num_envs: int, backend: str = "tpu",
                              seed: int = 0, **kwargs):
    """A real ``gymnasium.vector.VectorEnv`` over the batched engine.

    backend="tpu": jitted TetrisVectorEnv (device-resident state).
    backend="native": host C++ NativeVectorEnv (no accelerator).
    kwargs: the reference env kwargs (width, obs_type, lock_delay, ...).
    """
    import gymnasium
    from gymnasium.vector import VectorEnv
    from gymnasium.vector.utils import batch_space

    if backend == "tpu":
        core = _JaxVectorCore(num_envs, seed, **kwargs)
    elif backend == "native":
        core = _NativeVectorCore(num_envs, seed, **kwargs)
    else:
        raise ValueError(f"unknown backend {backend!r}")

    try:  # gymnasium >= 1.0: wrappers assert on the AutoresetMode enum
        from gymnasium.vector import AutoresetMode
        _mode = AutoresetMode.NEXT_STEP
    except ImportError:  # older gymnasium: informational string
        _mode = "NextStep"

    class _GymnasiumTetrisVector(VectorEnv):
        metadata = {"autoreset_mode": _mode}

        def __init__(self):
            self.num_envs = num_envs
            self.single_observation_space = \
                core.single_observation_space.to_gymnasium()
            self.single_action_space = core.single_action_space.to_gymnasium()
            self.observation_space = batch_space(
                self.single_observation_space, num_envs)
            self.action_space = batch_space(self.single_action_space, num_envs)

        def reset(self, *, seed=None, options=None):
            obs, info = core.reset(seed)
            return obs, _batched_info(info)

        def step(self, actions):
            obs, reward, term, info = core.step(np.asarray(actions))
            trunc = np.zeros(num_envs, dtype=bool)
            return obs, reward, term, trunc, _batched_info(info)

        def close_extras(self, **kw):
            pass

    return _GymnasiumTetrisVector()


class _JaxVectorCore:
    """Next-step-autoreset core over the jitted batched engine."""

    def __init__(self, num_envs: int, seed: int, **kwargs):
        import jax
        import jax.numpy as jnp
        from ..core import engine as E
        from .env import (TetrisVectorEnv, _select_done, apply_reset_mask,
                          build_observation, make_info)

        cfg = EnvConfig(**kwargs)
        if cfg.auto_reset:                 # the adapter owns reset timing
            raise ValueError(
                "auto_reset is owned by the gymnasium vector adapter "
                "(next-step autoreset); do not pass auto_reset=True")
        self._jax, self._jnp = jax, jnp
        self._env = TetrisVectorEnv(cfg, batch_size=num_envs)
        self._seed = seed
        self._reset_count = 0
        self._state = None
        self._pending = np.zeros(num_envs, dtype=bool)
        self.single_observation_space = self._env.observation_space
        self.single_action_space = self._env.action_space

        def fused_step(state, action, pending):
            """Reset pending envs (ignoring their action), step the rest.

            The stepped results of pending envs are discarded wholesale by
            ``apply_reset_mask`` (their reset comes from the PRE-step state),
            so the ignored action cannot leak — including into the deaths
            counter or RNG-visible state."""
            out = E.engine_step(cfg, state, action)
            new_state, emitted = apply_reset_mask(
                cfg, _select_done(pending, state, out.state),
                out.emitted_rows, pending)
            obs = build_observation(cfg, emitted)
            reward = jnp.where(pending, 0.0, out.reward)
            term = jnp.where(pending, False, out.done)
            return new_state, obs, reward, term, make_info(new_state)

        self._fused = jax.jit(fused_step)

    def reset(self, seed=None):
        import jax
        from .env import make_info
        if seed is not None:
            self._seed = seed
            self._reset_count = 0
        # gymnasium convention: reset(seed=None) must NOT replay the same
        # episodes — fold a reset counter into the key
        key = jax.random.fold_in(jax.random.PRNGKey(self._seed),
                                 self._reset_count)
        self._reset_count += 1
        obs, self._state = self._env.reset(key)
        self._pending[:] = False
        info = {k: np.asarray(v) for k, v in make_info(self._state).items()}
        return np.asarray(obs), info

    def step(self, actions):
        jnp = self._jnp
        self._state, obs, reward, term, info = self._fused(
            self._state, jnp.asarray(actions, jnp.int32),
            jnp.asarray(self._pending))
        term = np.asarray(term)
        self._pending = term.copy()
        return (np.asarray(obs), np.asarray(reward), term,
                {k: np.asarray(v) for k, v in info.items()})


class _NativeVectorCore:
    """Next-step-autoreset core over the host C++ vector env: pending envs are
    clear()ed and excluded from the step call (their action is ignored)."""

    def __init__(self, num_envs: int, seed: int, **kwargs):
        from .native_env import NativeVectorEnv

        obs_kw = {k: kwargs.pop(k) for k in
                  ("obs_type", "extend_dims", "render_mode") if k in kwargs}
        self._venv = NativeVectorEnv(num_envs, auto_reset=False, seed=seed,
                                     with_info=False, **obs_kw, **kwargs)
        self._pending = np.zeros(num_envs, dtype=bool)
        self.single_observation_space = self._venv.observation_space
        self.single_action_space = self._venv.action_space

    def reset(self, seed=None):
        if seed is not None:
            self._venv.reseed(seed)   # fresh engines + splitmix streams
        obs = self._venv.reset()
        self._pending[:] = False
        return obs, self._venv.infos()

    def step(self, actions):
        v = self._venv
        n = v.batch_size
        pend = self._pending
        boards = np.zeros((n, v.width, v.height), np.uint8)
        rewards = np.zeros(n, np.float32)
        term = np.zeros(n, dtype=bool)
        live = np.nonzero(~pend)[0]
        if live.size:
            handles = v._handles[live]
            acts = np.ascontiguousarray(actions[live], np.int32)
            lb = np.empty((live.size, v.width, v.height), np.uint8)
            lr = np.empty(live.size, np.float32)
            ld = np.empty(live.size, np.uint8)
            r1 = np.empty(live.size, np.int32)
            r2 = np.empty(live.size, np.int32)
            rc = v._lib.tetris_step_vec(handles, live.size, acts, 0,
                                        v.threads, lb, lr, ld, r1, r2)
            assert rc == 0
            boards[live], rewards[live] = lb, lr
            term[live] = ld != 0
        pend_idx = np.nonzero(pend)[0]
        if pend_idx.size:                 # reset obs = empty board, reward 0
            r0 = np.empty(pend_idx.size, np.int32)
            dump = np.empty((pend_idx.size, v.width, v.height), np.uint8)
            rc = v._lib.tetris_clear_vec(
                np.ascontiguousarray(v._handles[pend_idx]), pend_idx.size,
                r0, dump)
            assert rc == 0
        self._pending = term.copy()
        return v._observation(boards), rewards, term, self._venv.infos()