"""Train DQN briefly, evaluate vs random + heuristic, save a GIF of the agent."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # run from anywhere

import jax
import jax.numpy as jnp
import numpy as np

from gym_simpletetris_tpu import EnvConfig, TetrisVectorEnv
from gym_simpletetris_tpu.train.dqn import DQNConfig, make_train
from gym_simpletetris_tpu.train.evaluate import evaluate_policy, make_action_fn
from gym_simpletetris_tpu.utils.video import frames_from_rows, write_gif

cfg = DQNConfig(
    env=EnvConfig(obs_type="ram", auto_reset=True, reward_step=True,
                  penalise_holes_increase=True),
    num_envs=512, buffer_capacity=65536, learn_batch=512, learn_starts=2048)
init_fn, _, chunk_fn, network = make_train(cfg)
state = init_fn(jax.random.PRNGKey(0))
chunk = jax.jit(lambda s: chunk_fn(s, 500))
for i in range(20):
    state, metrics = chunk(state)
    print(f"chunk {i}: reward={float(metrics['mean_reward']):.2f} "
          f"q={float(metrics['mean_q']):.1f} eps={float(metrics['epsilon']):.2f}")

# evaluate
eval_env = TetrisVectorEnv(cfg.env, 128)


def dqn_action(obs, st):
    return jnp.argmax(network.apply(state.params, obs), axis=1).astype(jnp.int32)


for name, fn in [("dqn", dqn_action),
                 ("random", make_action_fn("random", cfg.env, 128)),
                 ("heuristic", make_action_fn("heuristic", cfg.env, 128))]:
    print(name, evaluate_policy(eval_env, fn, steps=500, seed=1))

# record the greedy agent
genv = TetrisVectorEnv(cfg.env.replace(auto_reset=False), 1)
obs, st = genv.reset(jax.random.PRNGKey(7))
hist = [genv.render_rows(st)]
for t in range(400):
    obs, st, r, d, _ = genv.step(st, dqn_action(obs, st))
    hist.append(genv.render_rows(st))
    if bool(d[0]):
        break
write_gif(frames_from_rows(genv.config, hist, size=160), "dqn_episode.gif")
print(f"wrote dqn_episode.gif ({len(hist)} frames)")
