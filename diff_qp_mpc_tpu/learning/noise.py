"""Observation-corruption modes (deqmpc/noise_utils.py:6-48), JAX-native.

Modes (selected by integer, matching --data_noise_type):
  0 none; 1 gaussian; 2 uniform; 3 element-drop-to-zero;
  4 vector-drop-to-zero; 5 element-hold-previous; 6 vector-hold-previous.
states: [bsz, T, nx]; for modes 3-6 ``noise_mean`` is the drop probability.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def corrupt_observation(key: Array, states: Array, noise_type: int,
                        noise_std: float = 0.0, noise_mean: float = 0.0
                        ) -> Array:
    bsz, T, nx = states.shape
    if noise_type == 0:
        return states
    if noise_type == 1:
        return states + jax.random.normal(key, states.shape, states.dtype) \
            * noise_std + noise_mean
    if noise_type == 2:
        return states + 2.0 * (jax.random.uniform(key, states.shape,
                                                  states.dtype) - 0.5) \
            * noise_std + noise_mean
    prev = jnp.roll(states, 1, axis=1)
    if noise_type in (3, 5):
        keep = jax.random.uniform(key, states.shape) > noise_mean
    elif noise_type in (4, 6):
        keep = (jax.random.uniform(key, (bsz, T)) > noise_mean)[:, :, None]
        keep = jnp.broadcast_to(keep, states.shape)
    else:
        raise NotImplementedError(noise_type)
    fill = jnp.zeros_like(states) if noise_type in (3, 4) else prev
    return jnp.where(keep, states, fill)
