"""Fused, jittable token-mask generation for MAE-style SSL.

The reference builds masks with per-sample Python randperm loops on the host
(ref: src/mae/masking.py:38-55 random/tube modes; src/datasets/mae_loader.py:80-90
noise-argsort tube mask; src/train_ssl.py:41-47 frame mask). Here every mode is
a single vectorized function of a JAX PRNG key: draw per-token uniform noise,
take the top-``num_mask`` by value. That is distributionally identical to
randperm-prefix selection, runs entirely on device, and batches over B with no
Python loops — so the mask generation fuses into the train step.

Convention: ``True = masked`` (same as the reference).
"""
from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp


def get_mask_ratio(epoch: int, schedule: List[Dict[str, Any]] | None, default: float) -> float:
    """Epoch-indexed mask-ratio schedule (ref: src/mae/masking.py:9-18).

    ``schedule`` is a list of {start, end, value} segments, start <= epoch < end.
    """
    if not schedule:
        return float(default)
    for seg in schedule:
        s = int(seg.get("start", 1))
        e = int(seg.get("end", 10 ** 9))
        v = float(seg.get("value", default))
        if s <= epoch < e:
            return v
    return float(default)


def _topk_mask(key: jax.Array, batch: int, n: int, num_mask: int) -> jax.Array:
    """[batch, n] bool with exactly num_mask True per row, uniformly at random."""
    noise = jax.random.uniform(key, (batch, n))
    # Rank of each position when sorted by descending noise; top num_mask -> masked.
    order = jnp.argsort(noise, axis=-1, descending=True)
    ranks = jnp.argsort(order, axis=-1)
    return ranks < num_mask


def random_token_mask(key: jax.Array, B: int, T: int, tokens_per_frame: int, mask_ratio: float) -> jax.Array:
    """[B, T*P] bool; exactly max(1, round(N*ratio)) masked per sample."""
    N = T * tokens_per_frame
    num_mask = max(1, int(round(N * mask_ratio)))
    return _topk_mask(key, B, N, num_mask)


def tube_token_mask(key: jax.Array, B: int, T: int, tokens_per_frame: int, mask_ratio: float) -> jax.Array:
    """[B, T*P] bool; spatial positions chosen once, broadcast across all T frames
    (ref: src/mae/masking.py:45-55)."""
    P = tokens_per_frame
    m_pf = max(1, int(round(P * mask_ratio)))
    spatial = _topk_mask(key, B, P, m_pf)  # [B, P]
    return jnp.tile(spatial, (1, T))  # frame-major layout: token n = t*P + p


def make_token_mask(
    key: jax.Array, B: int, T: int, tokens_per_frame: int, mask_ratio: float, mode: str
) -> jax.Array:
    """Dispatch on mode ∈ {random, tube} (ref: src/mae/masking.py:21-57)."""
    if mode == "random":
        return random_token_mask(key, B, T, tokens_per_frame, mask_ratio)
    if mode == "tube":
        return tube_token_mask(key, B, T, tokens_per_frame, mask_ratio)
    raise ValueError(f"Unknown mask_mode: {mode}")


def get_tube_mask(key: jax.Array, batch_size: int, num_frames: int, num_patches: int, mask_ratio: float) -> jax.Array:
    """[B, T, L] bool tube mask with int(ratio*L) masked patches per sample
    (pipeline-B semantics, ref: src/datasets/mae_loader.py:80-90: floor, not round)."""
    num_mask = int(mask_ratio * num_patches)
    spatial = _topk_mask(key, batch_size, num_patches, num_mask)  # [B, L]
    return jnp.broadcast_to(spatial[:, None, :], (batch_size, num_frames, num_patches))


def frame_mask(key: jax.Array, B: int, T: int, mask_ratio: float) -> jax.Array:
    """[B, T] bool frame-level mask for pipeline A's masked feature modeling
    (ref: src/train_ssl.py:41-47)."""
    num_mask = max(1, int(round(T * mask_ratio)))
    return _topk_mask(key, B, T, num_mask)


def count_masked(mask: jax.Array) -> int:
    return int(jnp.sum(mask))


def count_visible(mask: jax.Array) -> int:
    return int(jnp.sum(~mask))
