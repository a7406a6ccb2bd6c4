"""Patchify / unpatchify and norm-pix targets for pixel-space MAE.

Equivalent to the reference's einops-style reshapes (ref:
src/train_ssl_mae.py:26-31 patchify; src/visualize_mae.py:19-51 unpatchify)
but on channel-last clips [B, T, H, W, C]. Patch layout matches the
reference's token order: per frame, patches in row-major (gh, gw) order, and
within a patch the pixels in (ph, pw, C) order, so a pipeline-B model trained
here reconstructs the same per-token pixel vectors.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def patchify(clip: jax.Array, patch_size: int) -> jax.Array:
    """[B, T, H, W, C] -> [B, T*L, patch_size**2 * C], L = (H/p)*(W/p)."""
    B, T, H, W, C = clip.shape
    p = patch_size
    gh, gw = H // p, W // p
    x = clip.reshape(B, T, gh, p, gw, p, C)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)  # [B, T, gh, gw, p, p, C]
    return x.reshape(B, T * gh * gw, p * p * C)


def unpatchify(tokens: jax.Array, patch_size: int, T: int, H: int, W: int, C: int = 3) -> jax.Array:
    """Inverse of patchify: [B, T*L, p*p*C] -> [B, T, H, W, C]."""
    B = tokens.shape[0]
    p = patch_size
    gh, gw = H // p, W // p
    x = tokens.reshape(B, T, gh, gw, p, p, C)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)  # [B, T, gh, p, gw, p, C]
    return x.reshape(B, T, H, W, C)


def normalize_pix_target(target: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Per-patch (x - mean) / sqrt(var + eps) target normalization
    (ref: src/train_ssl_mae.py:74-77, the MAE norm_pix_loss trick)."""
    mean = jnp.mean(target, axis=-1, keepdims=True)
    var = jnp.var(target, axis=-1, keepdims=True)
    return (target - mean) / jnp.sqrt(var + eps)


def masked_mse(pred: jax.Array, target: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean squared error over masked tokens only (ref: src/train_ssl_mae.py:81-84).

    pred/target: [B, N, D]; mask: [B, N] bool/float, True = masked (in loss).
    """
    m = mask.astype(pred.dtype)
    per_token = jnp.mean((pred - target) ** 2, axis=-1)  # [B, N]
    return jnp.sum(per_token * m) / jnp.maximum(jnp.sum(m), 1.0)
