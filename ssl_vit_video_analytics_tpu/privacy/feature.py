"""Feature-level privacy: Gaussian perturbation and Bernoulli feature masking.

z' = z + N(0, sigma^2 I) and z' = z * Bernoulli(1 - r)
(ref: src/privacy/feature_noise.py:4-15) as pure functions of a PRNG key, so
they compose into any jitted inference/eval step.
"""
from __future__ import annotations

import jax


def add_gaussian_noise(key: jax.Array, z: jax.Array, sigma: float) -> jax.Array:
    if sigma <= 0:
        return z
    return z + jax.random.normal(key, z.shape, z.dtype) * sigma


def apply_feature_mask(key: jax.Array, z: jax.Array, mask_ratio: float) -> jax.Array:
    if mask_ratio <= 0:
        return z
    keep_prob = 1.0 - mask_ratio
    mask = jax.random.bernoulli(key, keep_prob, z.shape)
    return z * mask.astype(z.dtype)


def perturb_features(key: jax.Array, z: jax.Array, sigma: float, mask_ratio: float) -> jax.Array:
    """Noise then mask, the composition run_privacy sweeps over a grid
    (ref: src/run_privacy.py:286-300)."""
    k1, k2 = jax.random.split(key)
    return apply_feature_mask(k2, add_gaussian_noise(k1, z, sigma), mask_ratio)
