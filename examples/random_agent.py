"""The reference README's usage example (README.md:36-54), unchanged in shape:
single env, old-gym API, random actions, 10 episodes."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # run from anywhere

from gym_simpletetris_tpu import make

env = make("SimpleTetris-v0")
env.reset()

episode = 0
while episode < 10:
    obs, reward, done, info = env.step(env.action_space.sample())
    if done:
        print(f"episode {episode}: time={info['time']} score={info['score']} "
              f"lines={info['lines_cleared']} holes={info['holes']}")
        episode += 1
        env.reset()
env.close()
