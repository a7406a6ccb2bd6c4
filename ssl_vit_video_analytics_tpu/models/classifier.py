"""VideoClassifier: per-frame backbone embedding -> temporal mean -> linear head.

The ONE canonical implementation — the reference duplicates this class four
times (src/train_finetune.py:19-40, src/run_dynamic.py:20-42,
src/run_privacy.py:27-53, src/federated/utils_fed.py:10-28). The reference's
per-frame Python loop (``for t in range(T): backbone(clip[:,:,t])``,
ref: src/train_finetune.py:33-37) becomes one batched [B*T] encode: T small
per-frame convs/matmuls collapse into MXU-sized ones.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class VideoClassifier(nn.Module):
    # any (frames, train) -> (feat_map, emb) backbone: MobileViTBackbone
    # (reference parity) or TinyViTBackbone (MAE-pretrained transfer)
    backbone: nn.Module
    num_classes: int

    def setup(self):
        self.head = nn.Dense(self.num_classes, name="head")

    def __call__(self, clip, train: bool = False):
        """clip: [B, T, H, W, 3] -> logits [B, num_classes]."""
        return self.head(self.video_embedding(clip, train=train))

    def video_embedding(self, clip, train: bool = False):
        """Temporal mean of per-frame embeddings [B, D]
        (ref: src/run_privacy.py:45-53 extract_video_embedding)."""
        B, T, H, W, C = clip.shape
        frames = clip.reshape(B * T, H, W, C)
        _, emb = self.backbone(frames, train=train)
        return jnp.mean(emb.reshape(B, T, -1), axis=1)

    def frame_embedding(self, frames, train: bool = False):
        """[N, H, W, 3] -> [N, D]; used by the streaming early-exit path."""
        _, emb = self.backbone(frames, train=train)
        return emb

    def classify_embedding(self, emb):
        """[N, D] -> logits via the same head params (dynamic-inference path)."""
        return self.head(emb)
