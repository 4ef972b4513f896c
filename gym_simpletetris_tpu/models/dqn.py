"""Q-networks for SimpleTetris observations (flax.linen).

The reference ships no model code at all (SURVEY.md §2.6) — its README implies
external DQN agents trained on the 84x84 observations. This module provides the
framework's bundled model family, sized for TPU:

- ``NatureDQN``: the classic Atari conv stack for 84x84 grayscale/rgb frames
  (with optional frame stacking on the channel axis), bfloat16 compute,
  float32 params.
- ``RamDQN``: an MLP for the (W, H) ram observation.
- ``DuelingHead``: optional dueling value/advantage decomposition.
- ``C51Head``: distributional RL (Bellemare et al. 2017) — ``num_atoms > 0``
  on either trunk switches the output from scalar Q-values [B, A] to
  categorical return-distribution logits [B, A, num_atoms]; the trainer
  (train/dqn.py, ``DQNConfig.distributional``) owns the support and the
  projected cross-entropy loss. Composes with dueling (value/advantage
  decomposition per atom, mean-advantage identifiability constraint).

TP note: the dense layers carry nearly all parameters; ``train/dqn.py`` shards
them over the mesh's model axis when requested (pjit handles the collectives).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..core.engine import NUM_ACTIONS


class DuelingHead(nn.Module):
    """Q(s,a) = V(s) + A(s,a) - mean_a A(s,a)."""
    num_actions: int = NUM_ACTIONS
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        v = nn.Dense(1, dtype=self.dtype, name="value")(x)
        a = nn.Dense(self.num_actions, dtype=self.dtype, name="advantage")(x)
        return v + a - a.mean(axis=-1, keepdims=True)


class C51Head(nn.Module):
    """Categorical return-distribution logits [B, A, num_atoms].

    ``dueling=True`` decomposes per atom: logits = V(s) + A(s,a) - mean_a A
    (the C51 analogue of the dueling constraint, applied in logit space as in
    Rainbow, Hessel et al. 2018).
    """
    num_actions: int = NUM_ACTIONS
    num_atoms: int = 51
    dueling: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        a, z = self.num_actions, self.num_atoms
        if self.dueling:
            v = nn.Dense(z, dtype=self.dtype, name="value")(x)
            adv = nn.Dense(a * z, dtype=self.dtype, name="advantage")(x)
            adv = adv.reshape(adv.shape[:-1] + (a, z))
            logits = v[..., None, :] + adv - adv.mean(axis=-2, keepdims=True)
        else:
            logits = nn.Dense(a * z, dtype=self.dtype, name="logits")(x)
            logits = logits.reshape(logits.shape[:-1] + (a, z))
        return logits


class NatureDQN(nn.Module):
    """Mnih et al. conv trunk for 84x84 inputs, TPU-sized (bf16 compute).

    Input: [B, 84, 84, C] float32 (C = channels x stacked frames). Pixel values
    are the raw reference palette {0, 128, 190}; normalization happens here
    (scale 1/255) so the env can stay in its exact-parity integer palette.
    """
    num_actions: int = NUM_ACTIONS
    dueling: bool = False
    width_mult: int = 1
    num_atoms: int = 0   # > 0: C51 logits [B, A, num_atoms] instead of Q [B, A]
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        if x.ndim == 3:       # [B, 84, 84] grayscale without extend_dims
            x = x[..., None]
        x = x.astype(self.dtype) / 255.0
        w = self.width_mult
        x = nn.Conv(32 * w, (8, 8), strides=(4, 4), padding="VALID",
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x)
        x = nn.Conv(64 * w, (4, 4), strides=(2, 2), padding="VALID",
                    dtype=self.dtype, name="conv2")(x)
        x = nn.relu(x)
        x = nn.Conv(64 * w, (3, 3), strides=(1, 1), padding="VALID",
                    dtype=self.dtype, name="conv3")(x)
        x = nn.relu(x)
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(512 * w, dtype=self.dtype, name="dense")(x)
        x = nn.relu(x)
        if self.num_atoms > 0:
            q = C51Head(self.num_actions, self.num_atoms, self.dueling,
                        dtype=self.dtype)(x)
        elif self.dueling:
            q = DuelingHead(self.num_actions, dtype=self.dtype)(x)
        else:
            q = nn.Dense(self.num_actions, dtype=self.dtype, name="q")(x)
        return q.astype(jnp.float32)


class RamDQN(nn.Module):
    """MLP Q-network for the (W, H) ram observation (0/1 board)."""
    num_actions: int = NUM_ACTIONS
    hidden: Sequence[int] = (512, 256)
    dueling: bool = False
    num_atoms: int = 0   # > 0: C51 logits [B, A, num_atoms] instead of Q [B, A]
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = x.reshape((x.shape[0], -1)).astype(self.dtype)
        for i, h in enumerate(self.hidden):
            x = nn.Dense(h, dtype=self.dtype, name=f"dense{i}")(x)
            x = nn.relu(x)
        if self.num_atoms > 0:
            q = C51Head(self.num_actions, self.num_atoms, self.dueling,
                        dtype=self.dtype)(x)
        elif self.dueling:
            q = DuelingHead(self.num_actions, dtype=self.dtype)(x)
        else:
            q = nn.Dense(self.num_actions, dtype=self.dtype, name="q")(x)
        return q.astype(jnp.float32)


def build_q_network(obs_type: str, obs_shape, dueling: bool = False,
                    width_mult: int = 1, num_atoms: int = 0) -> nn.Module:
    """Pick the model family for an observation space shape.

    ``num_atoms > 0`` selects the distributional (C51) head: the network
    returns [B, A, num_atoms] logits; the trainer turns them into Q-values
    via the expected value over its support.
    """
    if obs_type == "ram":
        return RamDQN(dueling=dueling, num_atoms=num_atoms)
    return NatureDQN(dueling=dueling, width_mult=width_mult,
                     num_atoms=num_atoms)
