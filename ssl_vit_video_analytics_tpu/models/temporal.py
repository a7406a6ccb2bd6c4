"""TemporalSSL: MobileViT encoder + temporal transformer for SSL pipeline A.

Structure mirrors the reference (ref: src/train_ssl.py:97-158): per-frame
MobileViT embeddings, learned temporal position embedding, mask-token
substitution on masked FRAMES, a pre-norm temporal transformer producing
context tokens, a BatchNorm-MLP predictor, and a 4-way temporal-order (TOP)
head. Per-frame encoding is one batched [B*T] pass, not a Python loop.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import TransformerEncoder, trunc02
from .mobilevit import MobileViTBackbone


class TemporalSSL(nn.Module):
    embed_dim: int = 256
    layers: int = 4
    heads: int = 4
    clip_len: int = 32
    dtype: jnp.dtype = jnp.float32
    attn_impl: str | None = None

    def setup(self):
        self.encoder = MobileViTBackbone(embed_dim=self.embed_dim, dtype=self.dtype,
                                         attn_impl=self.attn_impl)
        self.pos = self.param("pos", trunc02, (1, self.clip_len, self.embed_dim))
        self.mask_token = self.param("mask_token", trunc02, (1, 1, self.embed_dim))
        self.temporal = TransformerEncoder(self.layers, self.heads, mlp_ratio=4.0,
                                           dtype=self.dtype, attn_impl=self.attn_impl)
        self.predictor_fc1 = nn.Dense(self.embed_dim, dtype=self.dtype)
        self.predictor_bn1 = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        self.predictor_fc2 = nn.Dense(self.embed_dim, dtype=self.dtype)
        self.top_head = nn.Dense(4, dtype=self.dtype)

    def __call__(self, clip, mask=None, train: bool = False):
        return self.forward_tokens(clip, mask=mask, train=train)

    def init_all(self, clip, mask=None):
        """Touch every head so ``init(method='init_all')`` creates all params
        (flax creates params lazily on first use)."""
        ctx = self.forward_tokens(clip, mask=mask, train=False)
        B, T, D = ctx.shape
        pred = self.predictor(ctx.reshape(B * T, D), train=False)
        top = self.top_logits(ctx)
        return ctx, pred, top

    def forward_tokens(self, clip, mask=None, train: bool = False):
        """clip: [B, T, H, W, 3]; mask: [B, T] bool or None -> ctx [B, T, D]."""
        B, T, H, W, C = clip.shape
        frames = clip.reshape(B * T, H, W, C)
        _, f = self.encoder(frames, train=train)  # [B*T, D]
        f = f.reshape(B, T, self.embed_dim)
        f = f + self.pos[:, :T, :].astype(f.dtype)
        if mask is not None:
            f = jnp.where(mask[..., None], self.mask_token.astype(f.dtype), f)
        return self.temporal(f, deterministic=not train)

    def predictor(self, x, train: bool = False):
        """[N, D] -> [N, D] MLP with BatchNorm (ref: src/train_ssl.py:128-136)."""
        x = self.predictor_fc1(x)
        x = self.predictor_bn1(x, use_running_average=not train)
        x = nn.gelu(x)
        return self.predictor_fc2(x)

    def top_logits(self, ctx):
        """Temporal-order logits from mean-pooled context (ref: src/train_ssl.py:238-246)."""
        return self.top_head(jnp.mean(ctx, axis=1))
