"""Frame-ring replay (round 4): single-copy frame storage with gather-time
stack reconstruction and sample-time n-step folding must be *semantically
identical* to the stacked-storage ring + rolling window it replaces.

Three angles:
  1. transition contents vs a straightforward numpy reference over a scripted
     trajectory with episode boundaries and ring wraparound;
  2. the actor's trajectory (actions/rewards) is bitwise identical between
     frame_ring=True and False (same seed, n_step=1 so the legacy path has no
     prefill skew);
  3. sampling validity: PER draws stay inside the sampleable age window after
     wrap; the mesh-aware trainer matches the unsharded one bitwise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_simpletetris_tpu import EnvConfig
from gym_simpletetris_tpu.train.replay import (
    FrameRingState, frame_ring_init, frame_ring_insert_frame,
    frame_ring_insert_step, frame_ring_sample, frame_ring_sample_prioritized,
    frame_ring_stack_newest, _frame_ring_batch, replay_update_priority)


def _script_trajectory(T, B, F, seed=0, p_done=0.15):
    rng = np.random.RandomState(seed)
    frames = rng.randint(0, 255, (T, B, F)).astype(np.uint8)
    actions = rng.randint(0, 7, (T, B)).astype(np.int8)
    rewards = rng.randn(T, B).astype(np.float32)
    dones = (rng.rand(T, B) < p_done)
    return frames, actions, rewards, dones


def _fill_ring(rs, frames, actions, rewards, dones):
    ins_f = jax.jit(frame_ring_insert_frame)
    ins_s = jax.jit(frame_ring_insert_step)
    for t in range(frames.shape[0]):
        rs = ins_f(rs, jnp.asarray(frames[t]))
        rs = ins_s(rs, jnp.asarray(actions[t]), jnp.asarray(rewards[t]),
                   jnp.asarray(dones[t]))
    return rs


def _np_stack(frames, dones, t, b, k):
    """Reference stack ending at time t for env b: position j steps back
    clamps to the episode's first frame (reset-to-repeat semantics)."""
    out = np.empty(frames.shape[-1:] + (k,), frames.dtype)
    off = 0
    ok = True
    for j in range(k):
        if j > 0:
            ok = ok and (t - j >= 0) and not dones[t - j, b]
            if ok:
                off = j
        out[:, k - 1 - j] = frames[t - off, b]
    return out


@pytest.mark.parametrize("T,S,k,n", [(20, 32, 4, 3),   # unwrapped
                                     (50, 16, 4, 3),   # wrapped ring
                                     (30, 16, 1, 1),   # degenerate stack
                                     (40, 16, 3, 2)])
def test_frame_ring_contents_vs_numpy(T, S, k, n):
    B, F, gamma = 5, 12, 0.9
    frames, actions, rewards, dones = _script_trajectory(T, B, F)
    rs = frame_ring_init(S * B, (F,), B, k, n, gamma)
    rs = _fill_ring(rs, frames, actions, rewards, dones)

    filled = min(T, S)
    assert int(rs.filled_slots) == filled
    valid = int(rs.valid_slots)
    assert valid == max(filled - k - n + 1, 0)

    # every valid age m maps to trajectory time t = T-1-m
    ages = list(range(n, n + valid))
    slots = jnp.asarray([(T - 1 - m) % S for m in ages], jnp.int32)
    for b in range(B):
        env = jnp.full((len(ages),), b, jnp.int32)
        got = jax.jit(_frame_ring_batch)(rs, slots, env)
        for i, m in enumerate(ages):
            t = T - 1 - m
            exp_obs = _np_stack(frames, dones, t, b, k)
            exp_next = _np_stack(frames, dones, t + n, b, k)
            if k == 1:
                exp_obs, exp_next = exp_obs[:, 0], exp_next[:, 0]
            np.testing.assert_array_equal(
                np.asarray(got["obs"][i], np.uint8).reshape(exp_obs.shape),
                exp_obs, err_msg=f"obs t={t} b={b}")
            np.testing.assert_array_equal(
                np.asarray(got["next_obs"][i],
                           np.uint8).reshape(exp_next.shape),
                exp_next, err_msg=f"next_obs t={t} b={b}")
            assert int(got["action"][i]) == actions[t, b]
            ret, alive, done_any = 0.0, 1.0, False
            for i2 in range(n):
                ret += (gamma ** i2) * alive * rewards[t + i2, b]
                alive *= (1.0 - float(dones[t + i2, b]))
                done_any |= bool(dones[t + i2, b])
            np.testing.assert_allclose(float(got["reward"][i]), ret,
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(float(got["discount"][i]),
                                       (gamma ** n) * alive, rtol=1e-6)
            assert bool(got["done"][i]) == done_any


def test_actor_dynslice_equals_gather_path():
    """frame_ring_stack_newest (gather-free dynamic-slice + cascaded clamp)
    must equal the general gather path _ring_stack at the newest slot, for
    random ring contents incl. wrap and episode boundaries."""
    from gym_simpletetris_tpu.train.replay import _ring_stack
    for seed, T, S in [(0, 25, 16), (1, 40, 16), (2, 9, 12)]:
        B, F, k = 6, 8, 4
        frames, actions, rewards, dones = _script_trajectory(
            T, B, F, seed=seed, p_done=0.3)
        rs = frame_ring_init(S * B, (F,), B, k, 2, 0.99)
        rs = _fill_ring(rs, frames[:-1], actions[:-1], rewards[:-1],
                        dones[:-1])
        rs = jax.jit(frame_ring_insert_frame)(rs, jnp.asarray(frames[-1]))
        fast = np.asarray(jax.jit(frame_ring_stack_newest)(rs))
        slot = jnp.full((B,), rs.ptr, jnp.int32)
        ref = np.asarray(jax.jit(_ring_stack)(
            rs, slot, jnp.arange(B, dtype=jnp.int32)))
        np.testing.assert_array_equal(fast, ref)


def test_actor_stack_matches_newest():
    """frame_ring_stack_newest == the reference stack of the newest time."""
    T, S, B, F, k = 25, 16, 4, 9, 4
    frames, actions, rewards, dones = _script_trajectory(T, B, F, seed=3)
    rs = frame_ring_init(S * B, (F,), B, k, 2, 0.99)
    rs = _fill_ring(rs, frames[:-1], actions[:-1], rewards[:-1], dones[:-1])
    rs = jax.jit(frame_ring_insert_frame)(rs, jnp.asarray(frames[-1]))
    stack = np.asarray(jax.jit(frame_ring_stack_newest)(rs))
    for b in range(B):
        np.testing.assert_array_equal(
            stack[b].reshape(F, k), _np_stack(frames, dones, T - 1, b, k))


def test_trainer_trajectory_bitwise_vs_legacy():
    """Same seed, n_step=1: the frame-ring trainer's actor (both layouts)
    must produce the exact same reward/episode stream as the stacked-storage
    trainer (stacks reconstructed from the ring == stacks maintained by
    shifting == stacks stored whole)."""
    from gym_simpletetris_tpu.train.dqn import DQNConfig, make_train

    streams = []
    for fr, stacks in ((False, False), (True, False), (True, True)):
        cfg = DQNConfig(
            env=EnvConfig(obs_type="grayscale", auto_reset=True, width=6,
                          height=8, reward_step=True),
            num_envs=8, buffer_capacity=512, learn_batch=16,
            learn_starts=10**9,        # actor-only: isolate stack behavior
            frame_stack=4, n_step=1, frame_ring=fr, ring_stacks=stacks)
        init_fn, step_fn, _, _ = make_train(cfg)
        state = init_fn(jax.random.PRNGKey(11))
        stepj = jax.jit(step_fn)
        rews, eps = [], []
        for _ in range(60):
            state, m = stepj(state)
            rews.append(float(m["mean_reward"]))
            eps.append(float(m["episodes_done"]))
        streams.append((rews, eps))
    assert streams[0] == streams[1] == streams[2]


@pytest.mark.parametrize("T,S,k,n", [(20, 32, 4, 3), (50, 16, 4, 2)])
def test_obs_ring_contents_vs_numpy(T, S, k, n):
    """Obs-ring (stacked=True) layout: slot t stores the maintained stack;
    sampled transitions must match the same numpy reference (obs = stack at
    t, next = stack at t+n incl. the reset-repeat boundary, scalars folded
    identically)."""
    B, F, gamma = 5, 12, 0.9
    frames, actions, rewards, dones = _script_trajectory(T, B, F, seed=9)
    # the actor-maintained stack at each t, via the reference clamp rule
    stacks = np.stack([np.stack([_np_stack(frames, dones, t, b, k)
                                 for b in range(B)])
                       for t in range(T)])               # [T, B, F, k]
    rs = frame_ring_init(S * B, (F,), B, k, n, gamma, stacked=True)
    ins_f = jax.jit(frame_ring_insert_frame)
    ins_s = jax.jit(frame_ring_insert_step)
    for t in range(T):
        rs = ins_f(rs, jnp.asarray(stacks[t].reshape(B, -1)))
        rs = ins_s(rs, jnp.asarray(actions[t]), jnp.asarray(rewards[t]),
                   jnp.asarray(dones[t]))
    filled = min(T, S)
    valid = int(rs.valid_slots)
    assert valid == max(filled - 1 - n + 1, 0)   # history_slots == 1
    ages = list(range(n, n + valid))
    slots = jnp.asarray([(T - 1 - m) % S for m in ages], jnp.int32)
    for b in range(B):
        env = jnp.full((len(ages),), b, jnp.int32)
        got = jax.jit(_frame_ring_batch)(rs, slots, env)
        for i, m in enumerate(ages):
            t = T - 1 - m
            np.testing.assert_array_equal(
                np.asarray(got["obs"][i], np.uint8).reshape(F, k),
                stacks[t, b], err_msg=f"obs t={t} b={b}")
            np.testing.assert_array_equal(
                np.asarray(got["next_obs"][i], np.uint8).reshape(F, k),
                stacks[t + n, b], err_msg=f"next t={t} b={b}")
            assert int(got["action"][i]) == actions[t, b]
            ret, alive, done_any = 0.0, 1.0, False
            for i2 in range(n):
                ret += (gamma ** i2) * alive * rewards[t + i2, b]
                alive *= (1.0 - float(dones[t + i2, b]))
                done_any |= bool(dones[t + i2, b])
            np.testing.assert_allclose(float(got["reward"][i]), ret,
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(float(got["discount"][i]),
                                       (gamma ** n) * alive, rtol=1e-6)
            assert bool(got["done"][i]) == done_any


def test_per_sampling_stays_in_valid_window():
    T, S, B, F, k, n = 50, 16, 4, 6, 4, 3   # wrapped
    frames, actions, rewards, dones = _script_trajectory(T, B, F, seed=5)
    rs = frame_ring_init(S * B, (F,), B, k, n, 0.99)
    rs = _fill_ring(rs, frames, actions, rewards, dones)
    # perturb priorities to spread mass, keep them positive
    rs = replay_update_priority(
        rs, jnp.arange(S * B), jnp.abs(jnp.sin(jnp.arange(S * B) + 1.0)),
        alpha=0.6)
    _, idx, w = jax.jit(
        lambda rs, key: frame_ring_sample_prioritized(rs, key, 256, 0.5)
    )(rs, jax.random.PRNGKey(0))
    slots = np.asarray(idx) // B
    age = (int(rs.ptr) - 1 - slots) % S
    assert (age >= n).all() and (age <= S - k).all()
    assert (np.asarray(w) > 0).all()
    # uniform sampler too
    batch = jax.jit(
        lambda rs, key: frame_ring_sample(rs, key, 256)
    )(rs, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(batch["reward"])).all()


@pytest.mark.parametrize("stacks", [False, True])
def test_frame_ring_mesh_matches_unsharded(stacks):
    """make_train(frame_ring=True, mesh=...) metrics == unsharded, both
    ring layouts."""
    from jax.sharding import Mesh
    from gym_simpletetris_tpu.train.dqn import DQNConfig, make_train

    cfg = DQNConfig(
        env=EnvConfig(obs_type="grayscale", auto_reset=True, width=6,
                      height=8, reward_step=True),
        # uniform sampling: PER's inverse-CDF flips sample indices under
        # float reduction-order jitter, so a multi-step sharded-vs-unsharded
        # trajectory comparison is only meaningful with RNG-only sampling
        # (PER x mesh is covered bitwise single-step by dryrun_multichip)
        num_envs=16, buffer_capacity=512, learn_batch=16, learn_starts=32,
        frame_stack=4, n_step=2, prioritized=False, dueling=True,
        noisy=True, frame_ring=True, ring_stacks=stacks)

    init_u, step_u, chunk_u, _ = make_train(cfg)
    su = jax.jit(init_u)(jax.random.PRNGKey(2))
    su, mu = jax.jit(lambda s: chunk_u(s, 16))(su)

    devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("data", "model"))
    init_s, _, chunk_s, _ = make_train(cfg, mesh=mesh)
    ss = init_s(jax.random.PRNGKey(2))
    ss, ms = chunk_s(ss, 16)
    # the hard guarantees (same pattern as test_sharding's DQN check):
    # integer env/replay state bitwise, params to reduction-order tolerance
    np.testing.assert_array_equal(np.asarray(su.env_state.rows),
                                  np.asarray(ss.env_state.rows))
    np.testing.assert_array_equal(np.asarray(su.replay.frame),
                                  np.asarray(ss.replay.frame))
    np.testing.assert_array_equal(np.asarray(su.replay.done),
                                  np.asarray(ss.replay.done))
    assert int(ss.learn_steps) == int(su.learn_steps) > 0
    # params to a loose float tolerance: TP reorders the dense reductions
    # (~1e-7 grad noise) and Adam's 1/sqrt(nu) amplifies it while nu is tiny
    # in the first learner steps — the bitwise integer-state assertions above
    # are the real behavioral guarantee (identical trajectories all 16 steps)
    for (pu, lu), (ps, ls) in zip(
            jax.tree_util.tree_leaves_with_path(su.params),
            jax.tree_util.tree_leaves_with_path(ss.params)):
        np.testing.assert_allclose(np.asarray(lu), np.asarray(ls),
                                   rtol=0, atol=5e-3,
                                   err_msg=jax.tree_util.keystr(pu))
    for kk in mu:
        # near-zero-scale metrics: absolute tolerance is the right frame
        np.testing.assert_allclose(np.asarray(mu[kk]), np.asarray(ms[kk]),
                                   rtol=5e-2, atol=2e-3, err_msg=kk)
    np.testing.assert_array_equal(np.asarray(mu["episodes_done"]),
                                  np.asarray(ms["episodes_done"]))


def test_slot_row_sampling_contents_and_weights():
    """Slot-row sampling (round 5): a slot-row batch must contain exactly
    the transitions the per-transition materializer produces for
    (slot, env=0..B-1), on both ring layouts; the slot-PER weights must be
    the exact slot-level importance ratios; and the row-write priority
    update must land the same values as the flat scatter."""
    import jax
    import jax.numpy as jnp
    from gym_simpletetris_tpu.train import replay as rp

    B, F, k, n = 4, 6, 3, 2
    rng = np.random.RandomState(0)

    # --- obs-ring layout -------------------------------------------------
    rs = rp.frame_ring_init(64, (F,), B, frame_stack=k, n_step=n,
                            gamma=0.9, stacked=True)
    for t in range(16):
        rs = rp.frame_ring_insert_frame(
            rs, jnp.asarray(rng.randint(0, 200, (B, F * k)), jnp.uint8))
        rs = rp.frame_ring_insert_step(
            rs, jnp.asarray(rng.randint(0, 7, B)),
            jnp.asarray(rng.randn(B), jnp.float32),
            jnp.asarray(rng.rand(B) < 0.2))
    rs = rs.replace(priority=jnp.asarray(
        rng.rand(*rs.priority.shape), jnp.float32))

    (batch, slot), _ = rp.frame_ring_sample_slots(
        rs, jax.random.PRNGKey(1), 2 * B), None
    ref = rp._frame_ring_batch(
        rs, jnp.repeat(slot, B), jnp.tile(jnp.arange(B), 2))
    for key in batch:
        np.testing.assert_array_equal(np.asarray(batch[key]),
                                      np.asarray(ref[key]), err_msg=key)

    bat_p, slot_p, w = rp.frame_ring_sample_slots_prioritized(
        rs, jax.random.PRNGKey(2), 2 * B, 0.5)
    grid = np.where(np.asarray(rp._frame_ring_valid_mask(rs))[:, None],
                    np.asarray(rs.priority), 0.0)
    p_s = grid.sum(1)
    q = p_s[np.asarray(slot_p)] / p_s.sum()
    n_tr = int(rs.valid_slots) * B
    w_ref = (1.0 / (n_tr * q / B)) ** 0.5
    w_max = (1.0 / (n_tr * (p_s[p_s > 0].min() / p_s.sum()) / B)) ** 0.5
    np.testing.assert_allclose(np.asarray(w).reshape(2, B)[:, 0],
                               w_ref / w_max, rtol=1e-5)

    td = jnp.asarray(rng.randn(2 * B), jnp.float32)
    via_rows = rp.replay_update_priority_slots(rs, slot_p, td, 0.6, 1e-3)
    flat_idx = (jnp.repeat(slot_p, B) * B + jnp.tile(jnp.arange(B), 2))
    via_flat = rp.replay_update_priority(rs, flat_idx, td, 0.6, 1e-3)
    # identical unless a duplicate slot was drawn with differing td rows
    if len(set(np.asarray(slot_p).tolist())) == 2:
        np.testing.assert_array_equal(np.asarray(via_rows.priority),
                                      np.asarray(via_flat.priority))

    # --- legacy layout ---------------------------------------------------
    ls = rp.replay_init(64, (F,), B)
    for t in range(16):
        o = jnp.asarray(rng.randint(0, 200, (B, F)), jnp.uint8)
        ls = rp.replay_insert(ls, o, o + 1,
                              jnp.asarray(rng.randint(0, 7, B)),
                              jnp.asarray(rng.randn(B), jnp.float32),
                              jnp.asarray(rng.rand(B) < 0.2), gamma=0.9)
    (lb, lslot), _ = rp.replay_sample_slots(ls, jax.random.PRNGKey(3),
                                            2 * B), None
    lref = rp._gather_batch(
        ls, jnp.repeat(lslot, B) * B + jnp.tile(jnp.arange(B), 2))
    for key in lb:
        np.testing.assert_array_equal(np.asarray(lb[key]),
                                      np.asarray(lref[key]), err_msg=key)


def test_dqn_sample_slots_trains():
    """End-to-end: the flagship feature set with sample_slots=True trains
    (finite loss, params move) on both PER and uniform paths, and the
    config validation rejects the unsupported shapes."""
    import jax
    from gym_simpletetris_tpu.train.dqn import DQNConfig, make_train

    for prio in (True, False):
        cfg = DQNConfig(
            env=EnvConfig(obs_type="grayscale", auto_reset=True, width=6,
                          height=8, reward_step=True),
            num_envs=8, buffer_capacity=512, learn_batch=16, learn_starts=64,
            frame_stack=4, n_step=3, prioritized=prio, dueling=True,
            distributional=True, noisy=True, frame_ring=True,
            ring_stacks=True, sample_slots=True)
        init_fn, step_fn, chunk_fn, _ = make_train(cfg)
        state = init_fn(jax.random.PRNGKey(0))
        p0 = jax.tree.leaves(state.params)[0]
        state, m = jax.jit(lambda s: chunk_fn(s, 32))(state)
        assert np.isfinite(float(m["loss"])) and float(m["loss"]) != 0.0
        assert float(jnp.abs(jax.tree.leaves(state.params)[0] - p0).sum()) > 0

    with pytest.raises(ValueError):
        DQNConfig(num_envs=8, buffer_capacity=512, learn_batch=12,
                  sample_slots=True)
    with pytest.raises(ValueError):
        DQNConfig(num_envs=8, buffer_capacity=512, learn_batch=16,
                  frame_stack=4, frame_ring=True, sample_slots=True)
