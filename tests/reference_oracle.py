"""Test-only loader for the upstream reference engine (the parity oracle).

This does NOT vendor or copy any reference code: it imports the reference module
in place from ``/root/reference`` at test time, with its two bitrot/IO problems
worked around (SURVEY.md §2.4):

- ``np.float`` was removed in numpy >= 1.24 but the reference allocates its board
  with it (tetris_env.py:140) — patched to ``float``;
- ``gym`` and ``pygame`` are imported at module top but are not needed for the
  engine; they are stubbed with minimal module objects.

It also instruments the reference's single RNG call site — ``random.randint``
inside ``_choose_shape`` (tetris_env.py:187) — recording every draw so the same
integer stream can be injected into the JAX engine (``injected_r``), which is how
seeded bitwise parity is defined (SURVEY.md §7.3 item 1).
"""

from __future__ import annotations

import importlib.util
import os
import random as _random
import sys
import types

import numpy as np

REF_ENV_PATH = "/root/reference/gym_simpletetris/envs/tetris_env.py"


def reference_available() -> bool:
    return os.path.exists(REF_ENV_PATH)


def _install_stubs():
    # Only stub what genuinely cannot be imported — clobbering an importable
    # module (e.g. real pygame) would break unrelated tests that use it.
    try:
        import pygame  # noqa: F401
        have_pygame = True
    except ImportError:
        have_pygame = False
    try:
        import gym  # noqa: F401
        have_gym = hasattr(sys.modules.get("gym"), "Env")
    except ImportError:
        have_gym = False
    if not have_gym:
        gym = types.ModuleType("gym")

        class _Env:
            def render(self, mode=None):
                raise NotImplementedError

        gym.Env = _Env
        spaces = types.ModuleType("gym.spaces")

        class Discrete:
            def __init__(self, n):
                self.n = n

        class Box:
            def __init__(self, low, high, shape=None, dtype=None):
                self.low, self.high, self.shape, self.dtype = low, high, shape, dtype

        spaces.Discrete = Discrete
        spaces.Box = Box
        gym.spaces = spaces
        sys.modules["gym"] = gym
        sys.modules["gym.spaces"] = spaces
    if not have_pygame and "pygame" not in sys.modules:
        sys.modules["pygame"] = types.ModuleType("pygame")
    if not hasattr(np, "float"):
        np.float = float  # type: ignore[attr-defined]


_LOAD_COUNT = 0


def load_reference_module():
    """Load a fresh, isolated instance of the reference tetris_env module."""
    global _LOAD_COUNT
    _install_stubs()
    _LOAD_COUNT += 1
    name = f"_ref_tetris_env_{_LOAD_COUNT}"
    spec = importlib.util.spec_from_file_location(name, REF_ENV_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class RecordingRandom:
    """Stands in for the module-global ``random`` inside the reference: delegates
    to a private Mersenne Twister (same stream as ``random.seed(s)`` + global
    functions) and records every randint draw as (value, lo, hi)."""

    def __init__(self, seed):
        self._rng = _random.Random(seed)
        self.draws = []

    def randint(self, a, b):
        v = self._rng.randint(a, b)
        self.draws.append((v, a, b))
        return v


class OracleEngine:
    """Reference TetrisEngine with an injected, recorded RNG stream."""

    def __init__(self, width=10, height=20, seed=42, **engine_kwargs):
        self.mod = load_reference_module()
        self.rng = RecordingRandom(seed)
        self.mod.random = self.rng
        self.engine = self.mod.TetrisEngine(width, height, **engine_kwargs)

    # -- draw bookkeeping -------------------------------------------------------
    def _with_draws(self, fn, *args):
        before = len(self.rng.draws)
        out = fn(*args)
        new = [v for (v, _, _) in self.rng.draws[before:]]
        return out, new

    def clear(self):
        """Returns (board_copy, draws): board as returned by clear() (no piece)."""
        board, draws = self._with_draws(self.engine.clear)
        return np.array(board, copy=True), draws

    def step(self, action):
        """Returns ((state, reward, done), draws)."""
        (state, reward, done), draws = self._with_draws(self.engine.step, action)
        return (np.array(state, copy=True), reward, done), draws

    def info(self):
        inf = dict(self.engine.get_info())
        inf["statistics"] = dict(inf["statistics"])  # snapshot the live dict quirk
        return inf

    def render(self):
        return np.array(self.engine.render(), copy=True)

    def valid_action_count(self):
        return self.engine.valid_action_count()


class OracleEnv:
    """Reference TetrisEnv (old gym API) with recorded RNG, for obs-level parity."""

    def __init__(self, seed=42, **env_kwargs):
        self.mod = load_reference_module()
        self.rng = RecordingRandom(seed)
        self.mod.random = self.rng
        self.env = self.mod.TetrisEnv(**env_kwargs)

    def _draws_since(self, n0):
        return [v for (v, _, _) in self.rng.draws[n0:]]

    def reset(self):
        n0 = len(self.rng.draws)
        obs = self.env.reset()
        return np.array(obs, copy=True), self._draws_since(n0)

    def step(self, action):
        n0 = len(self.rng.draws)
        obs, reward, done, info = self.env.step(action)
        info = dict(info)
        info["statistics"] = dict(info["statistics"])
        return (np.array(obs, copy=True), reward, done, info), self._draws_since(n0)
