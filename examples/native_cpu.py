"""Host-native backend tour: no accelerator, no JAX dispatch.

Three tiers, slowest to fastest:
  1. make(backend="native")      — drop-in old-gym single env (reference API)
  2. NativeVectorEnv             — B games per ctypes call, threaded
  3. NativeTetrisEngine.drive()  — bulk offline rollouts, ~4.6M steps/s

Run: python examples/native_cpu.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # run from anywhere

import time

import numpy as np

# GST_EXAMPLE_SMOKE=1 shrinks the run for the test suite
_SMOKE = bool(_os.environ.get("GST_EXAMPLE_SMOKE"))

from gym_simpletetris_tpu import make, NativeVectorEnv
from gym_simpletetris_tpu.native import NativeTetrisEngine

# -- 1. reference-style agent loop on the C++ engine -------------------------
env = make("SimpleTetris-v0", backend="native", obs_type="ram",
           reward_step=True, seed=0)
obs = env.reset()
ep_reward, episodes = 0.0, 0
rng = np.random.RandomState(0)
while episodes < 3:
    obs, reward, done, info = env.step(rng.randint(0, 7))
    ep_reward += reward
    if done:
        episodes += 1
        print(f"episode {episodes}: return {ep_reward:.0f}, "
              f"lines {info['lines_cleared']}, pieces {info['statistics']}")
        ep_reward = 0.0
        obs = env.reset()
print(env)  # ASCII board

# -- 2. batched vector env ----------------------------------------------------
venv = NativeVectorEnv(batch_size=256, obs_type="ram", auto_reset=True,
                       seed=1, with_info=True)
venv.reset()
t0 = time.perf_counter()
steps = 100 if _SMOKE else 2000
for _ in range(steps):
    obs, rew, done, info = venv.step(rng.randint(0, 7, 256))
dt = time.perf_counter() - t0
print(f"\nNativeVectorEnv: {steps * 256 / dt / 1e6:.2f}M env-steps/s "
      f"(256 games, auto-reset); total deaths {int(info['deaths'].sum())}")

# -- 3. bulk rollouts (checkpointable) ----------------------------------------
eng = NativeTetrisEngine(seed=2)
eng.clear()
actions = rng.randint(0, 7, 50_000 if _SMOKE else 1_000_000).astype(np.int32)
t0 = time.perf_counter()
boards, rewards, dones, _, _ = eng.drive(actions, auto_clear=True)
dt = time.perf_counter() - t0
snap = eng.save_state()          # bit-identical resume point
print(f"drive(): {len(actions) / dt / 1e6:.2f}M engine-steps/s, "
      f"{int(dones.sum())} episodes, state snapshot {snap.nbytes} bytes")
