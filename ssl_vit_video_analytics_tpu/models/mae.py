"""MAE models: pixel-space TinyVideoMAE (pipeline B) and feature-space
TinyViTMAE (pipeline C).

Pipeline B (ref: src/models/mae_vit_adapter.py:5-116): frames folded into the
batch -> TinyViT stage-3 features [BT, 14, 14, 384] -> linear to decoder dim
-> factorized temporal [1,T,1,D] + spatial [1,1,196,D] pos embeds ->
mask-token substitution (masking happens AFTER encoding; the encoder sees all
frames) -> full-sequence transformer decoder over T*196 = 3136 tokens -> per
patch pixel head (8*8*3 = 192).

Pipeline C (ref: src/models/tinyvit_mae.py:35-115): per-frame full TinyViT ->
stage-4 feature map adaptively pooled to stage4_pool^2 tokens -> mask-token
substitution -> decoder -> predict back to encoder dim; the target is the
stop-gradient encoder tokens.

XLA note: the reference returns ragged ``pred[mask]``/``target[mask]``
(ref: src/models/tinyvit_mae.py:113-114). Under jit that is a dynamic shape,
so these models return the FULL [B, N, D] prediction and token tensors; the
loss masks with weights — numerically identical (sum over masked / count).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import TransformerEncoder, adaptive_avg_pool_nhwc, trunc02
from .tiny_vit import TinyViT


class TinyVideoMAE(nn.Module):
    """Pixel-reconstruction VideoMAE over TinyViT stage-3 features."""

    encoder: TinyViT
    clip_len: int = 16
    img_size: int = 112
    patch_size: int = 8
    decoder_embed_dim: int = 384
    decoder_depth: int = 4
    decoder_num_heads: int = 6
    dtype: jnp.dtype = jnp.float32
    attn_impl: str | None = None
    # opt-in MoE decoder MLPs (expert parallelism; models/layers.py MoeMlp)
    decoder_moe_experts: int = 0
    decoder_moe_capacity_factor: float = 2.0
    decoder_moe_group_size: int = 0

    def setup(self):
        # setup-based (not nn.compact) so embed_tokens / predict_pixels are
        # separately apply-able: the pipeline-parallel path (parallel/pp.py)
        # runs the decoder block stack OUTSIDE the module, between the two.
        # Attribute names reproduce the original compact param tree exactly.
        D = self.decoder_embed_dim
        L = (self.img_size // self.patch_size) ** 2
        self.enc_to_dec = nn.Dense(D, dtype=self.dtype)
        self.temporal_pos_embed = self.param(
            "temporal_pos_embed", trunc02, (1, self.clip_len, 1, D))
        self.spatial_pos_embed = self.param(
            "spatial_pos_embed", trunc02, (1, 1, L, D))
        self.mask_token = self.param("mask_token", trunc02, (1, 1, D))
        self.decoder = TransformerEncoder(
            self.decoder_depth, self.decoder_num_heads, mlp_ratio=4.0,
            dtype=self.dtype, attn_impl=self.attn_impl,
            moe_experts=self.decoder_moe_experts,
            moe_capacity_factor=self.decoder_moe_capacity_factor,
            moe_group_size=self.decoder_moe_group_size)
        self.decoder_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)  # torch LN eps
        self.decoder_pred = nn.Dense(self.patch_size ** 2 * 3, dtype=self.dtype)

    def embed_tokens(self, clip, mask, train: bool = False):
        """Everything before the decoder blocks: encode -> project to decoder
        dim -> pos embeds -> mask-token substitution. Returns [B, T*L, D]."""
        B, T, H, W, C = clip.shape
        L = (self.img_size // self.patch_size) ** 2
        D = self.decoder_embed_dim

        x = clip.reshape(B * T, H, W, C)
        latent = self.encoder.forward_stage3(x, train=train)  # [BT, 14, 14, 384]
        hw = latent.shape[1] * latent.shape[2]
        latent = latent.reshape(B * T, hw, latent.shape[-1])

        x_dec = self.enc_to_dec(latent)
        x_dec = x_dec.reshape(B, T, L, D)
        x_dec = x_dec + (self.temporal_pos_embed[:, :T]
                         + self.spatial_pos_embed).astype(x_dec.dtype)

        mask_token = self.mask_token.astype(x_dec.dtype)
        m = mask.reshape(B, T, L, 1).astype(x_dec.dtype)
        x_dec = x_dec * (1.0 - m) + mask_token[:, None] * m
        return x_dec.reshape(B, T * L, D)

    def predict_pixels(self, x_dec):
        """Everything after the decoder blocks: final LN + pixel head."""
        return self.decoder_pred(self.decoder_norm(x_dec))

    def __call__(self, clip, mask, train: bool = False):
        """clip: [B, T, H, W, 3] float; mask: [B, T, L] bool (True = masked).

        Returns pred [B, T*L, patch_size^2*3].
        """
        x_dec = self.embed_tokens(clip, mask, train=train)
        x_dec = self.decoder(x_dec, deterministic=not train)
        return self.predict_pixels(x_dec)


class MAEDecoder(nn.Module):
    """proj -> transformer blocks -> predict back to embed dim
    (ref: src/models/tinyvit_mae.py:12-32)."""

    embed_dim: int
    decoder_dim: int
    depth: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32
    attn_impl: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.decoder_dim, dtype=self.dtype, name="proj")(x)
        x = TransformerEncoder(
            self.depth, self.num_heads, mlp_ratio=self.mlp_ratio,
            dtype=self.dtype, attn_impl=self.attn_impl, name="blocks",
        )(x, deterministic=not train)
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="pred")(x)


class TinyViTMAE(nn.Module):
    """Feature-space token MAE: targets are stop-gradient encoder tokens."""

    encoder: TinyViT
    stage4_pool: int = 3
    decoder_dim: int = 512
    decoder_depth: int = 2
    decoder_num_heads: int = 8
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32
    attn_impl: str | None = None

    @nn.compact
    def __call__(self, clip, token_mask, train: bool = False):
        """clip: [B, T, H, W, 3]; token_mask: [B, T*P] bool, P = stage4_pool^2.

        Returns (rec [B, N, D], target [B, N, D]) with target stop-gradiented;
        compute the loss on masked positions via weights.
        """
        B, T, H, W, C = clip.shape
        P = self.stage4_pool ** 2

        x = clip.reshape(B * T, H, W, C)
        feat = self.encoder(x, train=train)  # [BT, h, w, D4]
        pooled = adaptive_avg_pool_nhwc(feat, self.stage4_pool)  # [BT, s, s, D4]
        embed_dim = pooled.shape[-1]
        tok = pooled.reshape(B, T * P, embed_dim)

        mask_token = self.param("mask_token", trunc02, (1, 1, embed_dim)).astype(tok.dtype)
        tok_in = jnp.where(token_mask[..., None], mask_token, tok)

        rec = MAEDecoder(
            embed_dim=embed_dim, decoder_dim=self.decoder_dim, depth=self.decoder_depth,
            num_heads=self.decoder_num_heads, mlp_ratio=self.mlp_ratio,
            dtype=self.dtype, attn_impl=self.attn_impl, name="decoder",
        )(tok_in, train=train)

        return rec, jax.lax.stop_gradient(tok)
