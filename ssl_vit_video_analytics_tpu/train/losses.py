"""Loss library: MAE reconstruction losses + pipeline-A SSL losses.

MAE losses are weighted-masked versions of the reference's (ref:
src/mae/losses.py:19-90): identical math, but computed over full [B, N, D]
tensors with a mask-weight so shapes stay static under jit (sum over masked /
masked count == mean over the gathered masked tokens).

Pipeline-A losses (ref: src/train_ssl.py:26-34): negative-cosine BYOL-style
loss (2 - 2*cos) and the VICReg variance hinge.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _masked_mean(per_token: jax.Array, mask: jax.Array) -> jax.Array:
    """per_token: [B, N]; mask: [B, N] -> scalar mean over masked entries."""
    m = mask.astype(per_token.dtype)
    return jnp.sum(per_token * m) / jnp.maximum(jnp.sum(m), 1.0)


def mae_loss_l2(pred, target, mask, normalize_target: bool = True, eps: float = 1e-6):
    """L2 with optional per-token target normalization (MAE default,
    ref: src/mae/losses.py:19-41)."""
    pred = pred.astype(jnp.float32)
    target = jax.lax.stop_gradient(target).astype(jnp.float32)
    if normalize_target:
        mu = jnp.mean(target, axis=-1, keepdims=True)
        var = jnp.var(target, axis=-1, keepdims=True)
        target = (target - mu) / jnp.sqrt(var + eps)
    per_token = jnp.mean((pred - target) ** 2, axis=-1)
    return _masked_mean(per_token, mask)


def mae_loss_l1(pred, target, mask):
    """L1 over masked tokens (ref: src/mae/losses.py:44-49)."""
    per_token = jnp.mean(jnp.abs(pred.astype(jnp.float32)
                                 - jax.lax.stop_gradient(target).astype(jnp.float32)), axis=-1)
    return _masked_mean(per_token, mask)


def mae_loss_cosine(pred, target, mask, eps: float = 1e-8):
    """1 - cosine over masked tokens (ref: src/mae/losses.py:52-63)."""
    p = pred.astype(jnp.float32)
    t = jax.lax.stop_gradient(target).astype(jnp.float32)
    p = p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), eps)
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), eps)
    per_token = 1.0 - jnp.sum(p * t, axis=-1)
    return _masked_mean(per_token, mask)


def build_mae_loss(loss_type: str, normalize_target: bool = True):
    """Dispatch (ref: src/mae/losses.py:69-90)."""
    if loss_type == "l2":
        return lambda p, t, m: mae_loss_l2(p, t, m, normalize_target=normalize_target)
    if loss_type == "l1":
        return mae_loss_l1
    if loss_type == "cosine":
        return mae_loss_cosine
    raise ValueError(f"Unknown mae loss type: {loss_type}")


def reconstruction_error_stats(pred, target, mask) -> dict:
    """Diagnostics with the reference's key names mae_l1/mae_l2/pred_std/
    target_std (ref: src/mae/losses.py:96-108). The reference engine reads
    ``l1``/``l2`` and crashes (SURVEY.md §2.10.3); we implement the intended
    behavior: consistent ``mae_*`` keys everywhere."""
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    m = mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(m), 1.0)
    l1 = jnp.sum(jnp.mean(jnp.abs(p - t), axis=-1) * m) / denom
    l2 = jnp.sum(jnp.mean((p - t) ** 2, axis=-1) * m) / denom
    # std over masked tokens: weighted std of per-token values
    def masked_std(x):
        mean = jnp.sum(x * m[..., None]) / (denom * x.shape[-1])
        var = jnp.sum(((x - mean) ** 2) * m[..., None]) / (denom * x.shape[-1])
        return jnp.sqrt(var)
    return {
        "mae_l1": l1,
        "mae_l2": l2,
        "pred_std": masked_std(p),
        "target_std": masked_std(t),
    }


# ---------------- pipeline A (teacher-student SSL) ----------------

def cosine_loss(p: jax.Array, z: jax.Array) -> jax.Array:
    """2 - 2*cos(p, z), mean over rows (ref: src/train_ssl.py:26-29)."""
    p = p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-12)
    z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12)
    return 2.0 - 2.0 * jnp.mean(jnp.sum(p * z, axis=-1))


def variance_loss(z: jax.Array, target_std: float = 1.0, eps: float = 1e-4) -> jax.Array:
    """VICReg variance hinge: mean relu(target_std - std(z, axis=0))
    (ref: src/train_ssl.py:31-34)."""
    std = jnp.sqrt(jnp.var(z.astype(jnp.float32), axis=0) + eps)
    return jnp.mean(jax.nn.relu(target_std - std))
