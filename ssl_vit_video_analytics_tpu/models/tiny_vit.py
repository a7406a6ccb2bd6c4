"""TinyViT-21M variant for 112x112 inputs.

Same topology as the reference (ref: src/models/tiny_vit.py:136-191):
conv stem (stride 2 then 1 -> 56x56), stage 1 = MBConv x depth, stages 2-4 =
MBConv downsample + full-attention transformer blocks, dims [96,192,384,576],
depths [2,2,6,2], heads [3,6,12,18], key_dim = dim/heads, stochastic depth
linearly ramped to drop_path_rate over all blocks.

TPU-native details:
- remat (jax.checkpoint) per stage replaces torch gradient checkpointing
  (ref: src/models/tiny_vit.py:171-175,182-184) to trade FLOPs for HBM.
- attention runs via ops.attention (XLA fallback / Pallas flash kernel).
- ``stage_limit=3`` reproduces ``forward_stage3`` — the MAE pretraining
  feature tap yielding [B, 14, 14, 384] for 112x112 inputs
  (ref: src/models/tiny_vit.py:166-176).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import ConvBNAct, MBConv, TransformerBlock


class PatchEmbed(nn.Module):
    """Stem tuned for 112x112: stride 2 then stride 1 (ref: src/models/tiny_vit.py:62-72)."""

    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNAct(self.embed_dim // 2, kernel=3, stride=2, act=False, dtype=self.dtype)(x, train)
        x = nn.gelu(x)
        x = ConvBNAct(self.embed_dim, kernel=3, stride=1, act=False, dtype=self.dtype)(x, train)
        return x


class TinyViTStage(nn.Module):
    """One stage: optional MBConv downsample + depth blocks (conv or attention)."""

    dim: int
    depth: int
    num_heads: int
    downsample: bool
    conv_only: bool
    drop_paths: Sequence[float]
    dtype: jnp.dtype = jnp.float32
    attn_impl: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.downsample:
            x = MBConv(self.dim, stride=2, dtype=self.dtype, name="down")(x, train)
        for j in range(self.depth):
            if self.conv_only:
                x = MBConv(self.dim, drop_path=self.drop_paths[j], dtype=self.dtype,
                           name=f"mbconv{j}")(x, train)
            else:
                B, H, W, C = x.shape
                t = x.reshape(B, H * W, C)
                t = TransformerBlock(
                    self.num_heads, mlp_ratio=4.0, key_dim=self.dim // self.num_heads,
                    drop_path=self.drop_paths[j], dtype=self.dtype, attn_impl=self.attn_impl,
                    name=f"tblock{j}",
                )(t, deterministic=not train)
                x = t.reshape(B, H, W, C)
        return x


class TinyViT(nn.Module):
    embed_dims: Sequence[int] = (96, 192, 384, 576)
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 18)
    drop_path_rate: float = 0.1
    use_checkpoint: bool = True
    remat_stages: Sequence[int] | None = None  # None -> all stages when use_checkpoint
    dtype: jnp.dtype = jnp.float32
    attn_impl: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False, stage_limit: int = 4):
        x = PatchEmbed(self.embed_dims[0], dtype=self.dtype, name="patch_embed")(x, train)
        dpr = np.linspace(0.0, self.drop_path_rate, sum(self.depths)).tolist()
        cur = 0
        for i in range(stage_limit):
            stage = TinyViTStage(
                dim=self.embed_dims[i],
                depth=self.depths[i],
                num_heads=self.num_heads[i],
                downsample=i > 0,
                conv_only=i == 0,
                drop_paths=tuple(dpr[cur:cur + self.depths[i]]),
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                name=f"stage{i}",
            )
            # Selective remat: the memory hogs are the early stages' 56x56
            # MBConv expansions; later stages are cheap to store, expensive
            # to recompute.
            remat_this = self.use_checkpoint and train and (
                self.remat_stages is None or i in tuple(self.remat_stages))
            if remat_this:
                x = nn.remat(lambda mdl, y: mdl(y, train=True))(stage, x)
            else:
                x = stage(x, train)
            cur += self.depths[i]
        return x

    def forward_stage3(self, x, train: bool = False):
        """MAE feature tap: [B*T, 3, ...] frames -> [B*T, 14, 14, 384]."""
        return self(x, train=train, stage_limit=3)


def tiny_vit_21m_variant(use_checkpoint: bool = True, dtype=jnp.float32,
                         attn_impl: str | None = None, **kwargs) -> TinyViT:
    """dims [96,192,384,576] / depths [2,2,6,2] / heads [3,6,12,18]
    (ref: src/models/tiny_vit.py:188-191)."""
    return TinyViT(use_checkpoint=use_checkpoint, dtype=dtype, attn_impl=attn_impl, **kwargs)


class TinyViTBackbone(nn.Module):
    """(frames, train) -> (feat_map, emb) adapter over the TinyViT encoder so
    VideoClassifier can ride a pipeline-B/C MAE-pretrained checkpoint.

    The reference finetune only ever consumes MobileViT pipeline-A
    checkpoints (ref: src/train_finetune.py:43-63) — its flagship MAE
    pretrain feeds nothing downstream. This closes that gap: the inner
    module is named ``encoder`` so a pipeline-B encoder-only checkpoint
    (``params = {"encoder": ...}``, entry/train_ssl_mae.py save path) drops
    onto ``backbone/encoder`` with an exact tree match when ``stage_limit``
    equals the pretrain tap (3 — the MAE feature tap; 4 adds a randomly
    initialized stage-4 on top, pipeline-C style).

    The embedding is the global average pool of the final stage's feature
    map, matching MobileViTBackbone's (feat_map, emb) contract.
    """

    stage_limit: int = 3
    embed_dims: Sequence[int] = (96, 192, 384, 576)
    use_checkpoint: bool = False
    dtype: jnp.dtype = jnp.float32
    attn_impl: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = TinyViT(
            embed_dims=tuple(self.embed_dims),
            use_checkpoint=self.use_checkpoint,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="encoder",
        )(x, train=train, stage_limit=self.stage_limit)
        emb = jnp.mean(feat, axis=(1, 2))
        return feat, emb
