"""Bisect the eval-mode constancy of the TinyViT finetune embedding.

Round-4 finding (scripts/probe_tinyvit_ft_debug.py): on the MAE-pretrained
checkpoint the eval-mode video embedding is bit-identical across wildly
different inputs (cross-input per-dim std exactly 0), while train-mode
varies; random init is exactly zero in BOTH modes (unconditional zero-init
final MBConv BN — faithful to ref src/models/tiny_vit.py:48 but fatal
without a residual). This script walks the captured intermediates in eval
mode and reports, per module, the cross-input std of the output — the first
module printing 0 is where input dependence dies.

Run on CPU: JAX_PLATFORM_NAME=cpu python scripts/probe_tinyvit_eval_bisect.py
"""
from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssl_vit_video_analytics_tpu.train import finetune_engine as eng
from ssl_vit_video_analytics_tpu.utils.checkpoint import restore_checkpoint
from ssl_vit_video_analytics_tpu.ops.preprocess import normalize_clip


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else "results/sweep_r4_app/mae_b/ckpt/ckpt_epoch_60"
    B, T, S = 4, 1, 112
    rng = np.random.default_rng(0)
    clips = rng.integers(0, 256, size=(B, T, S, S, 3), dtype=np.uint8)
    clips[1] = 0
    clips[2] = 255
    model = eng.build_model(24, 512, backbone="tinyvit")
    print("init...", flush=True)
    variables = eng.init_model(model, jax.random.key(0), (B, T, S, S, 3))
    print("restore...", flush=True)
    ssl_vars = restore_checkpoint(ckpt)
    loaded = eng.load_pretrained_ssl(variables, ssl_vars)
    clip = normalize_clip(jnp.asarray(clips))

    print("apply (eval, capture_intermediates)...", flush=True)
    _, st = model.apply(
        {"params": loaded["params"], "batch_stats": loaded.get("batch_stats", {})},
        clip, train=False, method=model.video_embedding,
        mutable=["intermediates"], capture_intermediates=True,
    )
    inter = st["intermediates"]

    rows = []

    def walk(tree, path):
        if isinstance(tree, dict):
            if "__call__" in tree:
                out = tree["__call__"][0]
                if isinstance(out, tuple):
                    out = out[0]
                if hasattr(out, "shape") and out.ndim >= 2:
                    a = np.asarray(out, np.float32)
                    # fold the frame axis into batch if clips were flattened
                    n = a.shape[0]
                    per_clip = a.reshape(B, n // B, *a.shape[1:]) if n % B == 0 else a[None]
                    std = per_clip.std(axis=0).mean() if n % B == 0 else float("nan")
                    rows.append((path, tuple(a.shape), float(np.abs(a).mean()), float(std)))
            for k, v in tree.items():
                if k != "__call__":
                    walk(v, f"{path}/{k}")

    walk(inter, "")
    rows.sort(key=lambda r: r[0])
    print(f"{'module':70s} {'shape':>22s} {'absmean':>10s} {'xinput_std':>10s}")
    for path, shape, am, std in rows:
        flag = "  <== DEAD" if std == 0.0 else ""
        print(f"{path:70s} {str(shape):>22s} {am:10.4g} {std:10.4g}{flag}")


if __name__ == "__main__":
    main()
