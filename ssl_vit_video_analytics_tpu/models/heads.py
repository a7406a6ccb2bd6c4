"""Classification and multi-task SSL heads (ref: src/models/heads.py).

``SSLMultiTaskHead`` mirrors the reference's historical SSL variant (masked
feature reconstruction MLP + pairwise 2-way temporal-order head,
ref: src/models/heads.py:24-113). It is orphaned in the reference but kept in
the inventory for parity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn
import optax


class ClassificationHead(nn.Module):
    """GAP (if given a feature map) + Linear (ref: src/models/heads.py:6-21)."""

    num_classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if x.ndim == 4:  # [B, H, W, C] feature map
            x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)


class SSLMultiTaskHead(nn.Module):
    """Masked-feature-reconstruction MLP + 2-way temporal-order head.

    __call__(tokens, targets, mask, order_pairs, order_labels) -> loss dict.
    tokens/targets: [B, T, D]; mask: [B, T] bool; order_pairs: [B, 2] frame
    index pairs; order_labels: [B] in {0, 1} (is pair in order).
    """

    embed_dim: int
    mfm_weight: float = 1.0
    order_weight: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens, targets, mask, order_pairs, order_labels):
        D = self.embed_dim
        # masked feature modeling head: MLP back to embed dim
        h = nn.Dense(D * 2, dtype=self.dtype)(tokens)
        h = nn.gelu(h)
        recon = nn.Dense(D, dtype=self.dtype)(h)
        m = mask.astype(recon.dtype)[..., None]
        mfm = jnp.sum(((recon - jax.lax.stop_gradient(targets)) ** 2) * m) / (
            jnp.maximum(jnp.sum(m), 1.0) * D)

        # pairwise temporal-order head on concatenated frame embeddings
        b_idx = jnp.arange(tokens.shape[0])
        z0 = tokens[b_idx, order_pairs[:, 0]]
        z1 = tokens[b_idx, order_pairs[:, 1]]
        logits = nn.Dense(2, dtype=self.dtype)(jnp.concatenate([z0, z1], axis=-1))
        order = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(logits, order_labels))

        total = self.mfm_weight * mfm + self.order_weight * order
        return {"loss": total, "mfm": mfm, "order": order}
