"""Pipeline-B reconstruction viewer (reference: src/visualize_mae.py).

Loads a TinyVideoMAE checkpoint (warning if it is encoder-only — decoder
weights then stay random, ref: src/visualize_mae.py:104-108), picks a few
clips, and saves orig|masked|recon triptychs.

Usage:
  python -m ssl_vit_video_analytics_tpu.entry.visualize_mae \
      --config configs/ssl_mae.yaml --ckpt results/tinymae_v1/ckpt_epoch_200 \
      --num_samples 2
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..data.masking import get_tube_mask
from ..reporting.visualize import save_reconstruction_triptych
from ..utils.checkpoint import restore_checkpoint
from ..utils.io import ensure_dir
from . import common
from .train_ssl_mae import build_model


def main():
    p = common.make_parser("VideoMAE reconstruction viewer")
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--num_samples", type=int, default=2)
    p.add_argument("--out_dir", type=str, default="results/mae_vis")
    args = p.parse_args()
    cfg = common.load_merged_config(args, "configs/ssl_mae.yaml")
    dtype = common.compute_dtype_from(cfg)

    ds = common.dataset_from_cfg(cfg, common.split_path(cfg, cfg["dataset"]["train_split"]),
                                 "ssl")
    T, S = ds.clip_len, ds.image_size
    L = (S // 8) ** 2
    model = build_model(cfg, dtype)
    clip0 = jnp.zeros((1, T, S, S, 3), jnp.float32)
    variables = jax.jit(lambda k: model.init(k, clip0, jnp.zeros((1, T, L), bool)))(
        jax.random.key(0))

    if args.ckpt and os.path.exists(args.ckpt):
        blob = restore_checkpoint(args.ckpt)
        params = blob.get("params", blob)
        if "decoder" not in params:
            # encoder-only checkpoint: graft encoder, keep random decoder
            print("[WARN] checkpoint has no decoder weights; reconstructions "
                  "use a randomly initialized decoder")
            variables["params"]["encoder"] = params["encoder"]
            if blob.get("batch_stats") and variables.get("batch_stats"):
                variables["batch_stats"]["encoder"] = blob["batch_stats"]["encoder"]
        else:
            variables = {"params": params, "batch_stats": blob.get("batch_stats")}
        print(f"[INFO] loaded {args.ckpt}")
    else:
        print(f"[WARN] no checkpoint ({args.ckpt}); random weights")

    ensure_dir(args.out_dir)
    ratio = float(cfg.get("ssl", {}).get("mask_ratio", 0.9))
    for i in range(min(args.num_samples, len(ds))):
        clip_u8 = ds.get_clip(i)
        mask = get_tube_mask(jax.random.key(i), 1, T, L, ratio)
        out = save_reconstruction_triptych(
            model, variables, clip_u8, mask, 8,
            os.path.join(args.out_dir, f"recon_{i:03d}.png"), dtype,
            norm_pix=bool(cfg.get("ssl", {}).get("norm_pix_loss", False)))
        print(f"[INFO] wrote {out}")


if __name__ == "__main__":
    main()
