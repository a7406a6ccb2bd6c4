"""Privacy metrics (ref: src/privacy/metrics_privacy.py)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def prediction_entropy(logits: jax.Array) -> float:
    """Mean softmax entropy (ref: src/privacy/metrics_privacy.py:5-8)."""
    prob = jax.nn.softmax(logits.astype(jnp.float32), axis=1)
    ent = -jnp.sum(prob * jnp.log(prob + 1e-12), axis=1)
    return float(jnp.mean(ent))


def privacy_exposure_rate(before: float, after: float) -> float:
    """PER = after / max(before, 1e-6) (ref: src/privacy/metrics_privacy.py:11-12)."""
    return after / max(before, 1e-6)


def top1_accuracy(logits: jax.Array, labels: jax.Array) -> float:
    return float(jnp.mean((jnp.argmax(logits, axis=1) == labels).astype(jnp.float32)))
