"""MobileViT-S-like backbone, TPU-native.

Same topology and widths as the reference's from-scratch MobileViT
(ref: src/models/mobilevit.py:118-172): stem s2 -> 2 InvertedResidual stages
-> 3 (IR + MobileViT block) stages -> 1x1 head conv, returning both the
spatial feature map and the global-average-pooled embedding.

TPU-first simplification with identical math: the reference's MobileViT block
unfolds the feature map into patch-ordered tokens, runs full self-attention,
and folds back (ref: src/models/mobilevit.py:97-111). Since its attention is
over ALL Hp*Wp positions with no positional encoding, the unfold/fold
permutation is exactly cancelled by its inverse — full attention is
permutation-equivariant and the MLP is per-token. We therefore flatten
H*W -> L directly, which avoids two 6-D transposes per block and keeps the
layout XLA-friendly. Like the reference, odd grids (the 7x7 stage on 112
inputs) are zero-padded to a multiple of patch_size before attention and
cropped after (ref: src/models/mobilevit.py:91-94,110-111) — pad tokens
participate as attention keys exactly as they do upstream.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBNAct, InvertedResidual, TransformerBlock


class MobileViTBlock(nn.Module):
    """Local convs + global transformer + fuse (ref: src/models/mobilevit.py:60-115)."""

    out_features: int
    dim: int
    patch_size: int = 2
    depth: int = 2
    num_heads: int = 4
    mlp_ratio: float = 2.0
    dtype: jnp.dtype = jnp.float32
    attn_impl: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        y = ConvBNAct(C, kernel=3, dtype=self.dtype)(x, train)
        y = ConvBNAct(self.dim, kernel=1, dtype=self.dtype)(y, train)

        ps = self.patch_size
        pad_h = (ps - H % ps) % ps
        pad_w = (ps - W % ps) % ps
        if pad_h or pad_w:
            y = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        Hp, Wp = H + pad_h, W + pad_w

        tokens = y.reshape(B, Hp * Wp, self.dim)
        for i in range(self.depth):
            tokens = TransformerBlock(
                self.num_heads, mlp_ratio=self.mlp_ratio, dtype=self.dtype,
                attn_impl=self.attn_impl, name=f"tblock{i}",
            )(tokens, deterministic=not train)
        y = tokens.reshape(B, Hp, Wp, self.dim)
        if pad_h or pad_w:
            y = y[:, :H, :W, :]

        y = ConvBNAct(C, kernel=1, dtype=self.dtype)(y, train)
        z = jnp.concatenate([x, y], axis=-1)
        return ConvBNAct(self.out_features, kernel=3, dtype=self.dtype)(z, train)


class MobileViTBackbone(nn.Module):
    """Returns (feat_map [B, h, w, D], emb [B, D]) like the reference
    (ref: src/models/mobilevit.py:158-168)."""

    embed_dim: int = 256
    dtype: jnp.dtype = jnp.float32
    attn_impl: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d, ai = self.dtype, self.attn_impl
        x = ConvBNAct(16, kernel=3, stride=2, dtype=d, name="stem")(x, train)

        x = InvertedResidual(32, stride=2, dtype=d, name="s1_0")(x, train)
        x = InvertedResidual(32, stride=1, dtype=d, name="s1_1")(x, train)

        x = InvertedResidual(64, stride=2, dtype=d, name="s2_0")(x, train)
        x = InvertedResidual(64, stride=1, dtype=d, name="s2_1")(x, train)

        x = InvertedResidual(64, stride=1, dtype=d, name="mvit1_ir")(x, train)
        x = MobileViTBlock(96, dim=128, dtype=d, attn_impl=ai, name="mvit1")(x, train)

        x = InvertedResidual(96, stride=2, dtype=d, name="mvit2_ir")(x, train)
        x = MobileViTBlock(128, dim=160, dtype=d, attn_impl=ai, name="mvit2")(x, train)

        x = InvertedResidual(128, stride=2, dtype=d, name="mvit3_ir")(x, train)
        x = MobileViTBlock(160, dim=192, dtype=d, attn_impl=ai, name="mvit3")(x, train)

        feat = ConvBNAct(self.embed_dim, kernel=1, dtype=d, name="head")(x, train)
        emb = jnp.mean(feat, axis=(1, 2))
        return feat, emb


def build_mobilevit_s(embed_dim: int = 256, dtype=jnp.float32, attn_impl: str | None = None) -> MobileViTBackbone:
    return MobileViTBackbone(embed_dim=embed_dim, dtype=dtype, attn_impl=attn_impl)
