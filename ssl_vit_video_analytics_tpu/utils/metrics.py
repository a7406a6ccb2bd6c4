"""Metrics: top-k accuracy, prediction entropy, best tracking, minmax norm.

One canonical jittable top-k (the reference has three near-identical copies:
src/train_finetune.py:71-81, src/run_dynamic.py:65-74, src/run_federated.py:20-39).
"""
from __future__ import annotations

from typing import Mapping, Sequence

import jax
import jax.numpy as jnp


def topk_accuracy(logits: jax.Array, labels: jax.Array, ks: Sequence[int] = (1, 5)) -> dict:
    """Fraction of samples whose label is in the top-k logits, for each k.

    logits: [B, C] float; labels: [B] int. Returns {f"top{k}": scalar array}.
    """
    C = logits.shape[-1]
    maxk = min(max(ks), C)  # clamp: top-k beyond the class count is trivially 1.0
    _, topk_idx = jax.lax.top_k(logits, maxk)
    correct = topk_idx == labels[:, None]  # [B, maxk]
    out = {}
    for k in ks:
        out[f"top{k}"] = jnp.mean(jnp.any(correct[:, :min(k, C)], axis=1).astype(jnp.float32))
    return out


def prediction_entropy(logits: jax.Array) -> jax.Array:
    """Mean Shannon entropy of softmax predictions (ref: src/privacy/metrics_privacy.py:5-8)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    return jnp.mean(-jnp.sum(p * logp, axis=-1))


def privacy_exposure_rate(before: float, after: float) -> float:
    """PER = after / max(before, 1e-6) (ref: src/privacy/metrics_privacy.py:11-12)."""
    return after / max(before, 1e-6)


def update_best(best: Mapping | None, metrics: Mapping, key: str, mode: str = "max") -> tuple[dict, bool]:
    """Track the best epoch by one metric (ref: src/mae/metrics.py:7-16).

    Returns (new_best, improved).
    """
    cur = float(metrics[key])
    if best is None or key not in best:
        return dict(metrics), True
    prev = float(best[key])
    improved = cur > prev if mode == "max" else cur < prev
    return (dict(metrics) if improved else dict(best)), improved


def format_metrics(metrics: Mapping, precision: int = 4) -> str:
    """"k1=v1 k2=v2" epoch-summary line (ref: src/mae/metrics.py:19-27)."""
    parts = []
    for k, v in metrics.items():
        try:
            parts.append(f"{k}={float(v):.{precision}f}")
        except (TypeError, ValueError):
            parts.append(f"{k}={v}")
    return " ".join(parts)


def minmax_norm(values: Sequence[float]) -> list[float]:
    """Min-max normalize to [0,1]; constant input -> zeros (ref: src/utils.py:60-71)."""
    vals = [float(v) for v in values]
    lo, hi = min(vals), max(vals)
    if hi - lo < 1e-12:
        return [0.0 for _ in vals]
    return [(v - lo) / (hi - lo) for v in vals]


# --- throughput accounting (shared by bench.py and training logs) ---

V5E_PEAK_BF16_FLOPS = 197e12


def pipeline_b_flops_per_clip(clip_len: int, image_size: int = 112) -> float:
    """Analytic train-step FLOPs/clip for pipeline B: TinyViT stages 0-3
    ~8.8 GF/frame fwd @112^2 + 3136-token decoder ~106 GF/clip fwd, x3 for
    fwd+bwd."""
    return 3.0 * (8.8e9 * clip_len + 106e9) * (image_size / 112.0) ** 2


def pipeline_b_mfu(clips_per_sec: float, clip_len: int,
                   image_size: int = 112) -> float:
    """Model FLOPs utilization of the pipeline-B train step on one v5e."""
    return (clips_per_sec * pipeline_b_flops_per_clip(clip_len, image_size)
            / V5E_PEAK_BF16_FLOPS)
