"""Diagnose the TinyViT finetune chance-lock (round-4 app sweep).

Symptoms: every TinyViT finetune cell (even ft_random) sits at exactly
1/num_classes val top1 with constant top5 = 5/24, while train loss hovers
ABOVE ln(num_classes). Hypotheses probed here:

  H1 embedding scale: the stage-3 tap has no output norm; MAE-pretrained
     features may be huge, exploding the fresh head's logits (init loss
     6.27 >> ln 24 observed).
  H2 eval constancy: under train=False (BN running stats) the embedding is
     ~constant across inputs -> constant logits -> exact-chance top1.
  H3 train/eval BN divergence: train-mode embeddings differ wildly from
     eval-mode ones, so whatever the head learns never transfers to eval.

Run on CPU: JAX_PLATFORM_NAME=cpu python scripts/probe_tinyvit_ft_debug.py
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


def stats(tag, emb):
    emb = np.asarray(emb, np.float32)
    per_input_norm = np.linalg.norm(emb, axis=-1)
    cross = emb.std(axis=0)  # std across inputs per dim
    print(f"  {tag}: shape={emb.shape} absmean={np.abs(emb).mean():.4g} "
          f"norm(mean/min/max)={per_input_norm.mean():.4g}/{per_input_norm.min():.4g}/{per_input_norm.max():.4g} "
          f"cross-input per-dim std mean={cross.mean():.4g} max={cross.max():.4g}")


def main():
    ckpt = "results/sweep_r4_app/mae_b/ckpt/ckpt_epoch_60"
    B, T, S = 4, 8, 112
    rng = np.random.default_rng(0)
    clips = rng.integers(0, 256, size=(B, T, S, S, 3), dtype=np.uint8)
    # two distinct structured inputs too (not just noise)
    clips[1] = 0
    clips[2] = 255
    model = eng.build_model(24, 512, backbone="tinyvit")
    variables = eng.init_model(model, jax.random.key(0), (B, T, S, S, 3))
    has_bs = "batch_stats" in variables
    print(f"init: has batch_stats={has_bs}")

    clip = normalize_clip(jnp.asarray(clips))

    def embed(vars_, train):
        return model.apply(
            {"params": vars_["params"], "batch_stats": vars_.get("batch_stats", {})},
            clip, train=train, method=model.video_embedding,
            mutable=["batch_stats"] if train else False,
            rngs={"dropout": jax.random.key(1)} if train else None,
        )

    print("== random init ==")
    emb_t, _ = embed(variables, True)
    stats("train-mode", emb_t)
    emb_e = embed(variables, False)
    stats("eval-mode ", emb_e)

    if os.path.exists(ckpt):
        ssl_vars = restore_checkpoint(ckpt)
        print(f"ckpt cols: {list(ssl_vars.keys()) if isinstance(ssl_vars, dict) else type(ssl_vars)}")
        if isinstance(ssl_vars, dict) and "params" in ssl_vars:
            loaded = eng.load_pretrained_ssl(variables, ssl_vars)
            print("== MAE-pretrained ==")
            emb_t, _ = embed(loaded, True)
            stats("train-mode", emb_t)
            emb_e = embed(loaded, False)
            stats("eval-mode ", emb_e)
            # check the checkpoint actually carried batch_stats
            enc_bs = ssl_vars.get("batch_stats", {}).get("encoder")
            print(f"ckpt has encoder batch_stats: {enc_bs is not None}")
            if enc_bs is not None:
                leaves = jax.tree.leaves(enc_bs)
                mags = [float(np.abs(np.asarray(l)).mean()) for l in leaves]
                print(f"  encoder batch_stats leaves={len(leaves)} absmean(min/med/max)="
                      f"{np.min(mags):.4g}/{np.median(mags):.4g}/{np.max(mags):.4g}")
    else:
        print(f"no ckpt at {ckpt}")


if __name__ == "__main__":
    main()
