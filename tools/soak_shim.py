#!/usr/bin/env python
"""Shim-surface soak fuzz: random-configuration lockstep of the three
single-env user surfaces against the in-place reference, at soak depth.

Per config: random (geometry x lock-delay x all 9 scoring/step flags x
obs_type x extend_dims), then ``--steps`` lockstep steps comparing obs +
reward + done + the FULL info dict every step (resetting through episode
ends, injected draw streams). Surfaces rotate per config:

  gym        api.gym_compat.TetrisEnv  vs reference TetrisEnv (obs pipeline)
  engine     api.engine.TetrisEngine   vs reference TetrisEngine (board/info)
  native     api.native_env.NativeTetrisEnv vs reference TetrisEnv

The CI twin (bounded) is tests/test_shim_fuzz.py; this tool runs the same
families to arbitrary depth for the soak record.

Usage: python tools/soak_shim.py [--configs 30] [--steps 400] [--seed 0]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", type=int, default=30)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from test_shim_fuzz import random_env_kwargs
    from test_env_parity import run_env_lockstep
    from test_engine_standalone import run_lockstep as run_engine_lockstep
    from reference_oracle import OracleEnv
    from gym_simpletetris_tpu.api.native_env import NativeTetrisEnv

    def run_native(steps, seed, policy_seed, **kw):
        rng = np.random.RandomState(policy_seed)
        ref = OracleEnv(seed=seed, **kw)
        nat = NativeTetrisEnv(**kw)
        robs, draws = ref.reset()
        nobs = nat.reset(injected_r=draws[0])
        np.testing.assert_array_equal(robs, nobs)
        for t in range(steps):
            a = int(rng.randint(0, 7))
            (robs, rrew, rdone, rinfo), draws = ref.step(a)
            no, nr, nd, ni = nat.step(a, injected_r=draws[0] if draws else 0)
            np.testing.assert_array_equal(robs, no, err_msg=f"t={t}")
            assert float(rrew) == nr and bool(rdone) == nd, f"t={t}"
            assert rinfo == ni, f"t={t}: {rinfo} vs {ni}"
            if rdone:
                robs, draws = ref.reset()
                nobs = nat.reset(injected_r=draws[0])
                np.testing.assert_array_equal(robs, nobs)

    rng = np.random.RandomState(args.seed)
    total = 0
    t0 = time.time()
    surfaces = ["gym", "engine", "native"]
    for ci in range(args.configs):
        surface = surfaces[ci % len(surfaces)]
        kw = random_env_kwargs(rng, with_obs=(surface != "engine"))
        # image obs through the per-step python shim is slow; scale down
        steps = args.steps
        if surface != "engine" and kw.get("obs_type") != "ram":
            steps = max(60, args.steps // 4)
        if surface == "gym":
            run_env_lockstep(n_steps=steps, policy_seed=ci,
                             seed=args.seed * 1000 + ci, **kw)
        elif surface == "engine":
            run_engine_lockstep(steps, seed=args.seed * 1000 + ci,
                                policy_seed=ci, **kw)
        else:
            run_native(steps, seed=args.seed * 1000 + ci, policy_seed=ci,
                       **kw)
        total += steps
        print(f"[{ci+1}/{args.configs}] {surface:6s} "
              f"w{kw['width']} h{kw['height']} ld{kw['lock_delay']} "
              f"{kw.get('obs_type', '-'):9s} OK "
              f"({total} steps, {time.time()-t0:.0f}s)", flush=True)
    print(f"SHIM SOAK PASS: {total} lockstep steps bitwise across "
          f"{args.configs} random configs x 3 surfaces")


if __name__ == "__main__":
    main()
