"""Kernel cross-validation under REAL learning dynamics (round 3).

60 pipeline-B training steps from identical init with attn_impl=pallas vs
attn_impl=xla, norm-pix, no grad clip (the production recipe after the
round-3 frozen-training fix). The round-2 version of this check ran under
the silently frozen regime (BENCH.md), so trajectories barely moved; here
both arms descend fast, making the comparison meaningful.

Run on the chip: python scripts/probe_kernel_xval.py [--batch 16]
"""
from __future__ import annotations

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--data", default="/tmp/mae_lown/data")
    args = p.parse_args()

    from ssl_vit_video_analytics_tpu.entry.train_ssl_mae import build_model
    from ssl_vit_video_analytics_tpu.train.mae_engine import (
        make_pixel_mae_step, wrap_accum_and_skip)
    from ssl_vit_video_analytics_tpu.train.state import (
        create_train_state, make_optimizer, warmup_cosine_schedule)

    B, T, S = args.batch, 16, 112
    paths = sorted(glob.glob(os.path.join(args.data, "class*/vid*/packed_112.npy")))[:64]
    clips = np.stack([np.load(p_) for p_ in paths])
    cfg = {"model": {"type": "tiny_vit_21m_variant",
                     "embed_dims": [96, 192, 384, 576],
                     "decoder_embed_dim": 384, "decoder_depth": 4,
                     "decoder_num_heads": 6, "use_checkpoint": False},
           "dataset": {"clip_len": T, "image_size": S}}

    def run(attn_impl):
        model = build_model(cfg, jnp.bfloat16, attn_impl=attn_impl,
                            decoder_attn_impl=attn_impl)
        L = (S // 8) ** 2
        variables = jax.jit(lambda k: model.init(
            k, jnp.zeros((1, T, S, S, 3), jnp.float32),
            jnp.zeros((1, T, L), bool)))(jax.random.key(0))
        sched = warmup_cosine_schedule(5e-4, 10, args.steps, 0.0)
        tx = wrap_accum_and_skip(
            make_optimizer(sched, weight_decay=0.05, grad_clip=None), 1)
        state = create_train_state(variables["params"], tx,
                                   batch_stats=variables.get("batch_stats"))
        step_fn = make_pixel_mae_step(model, tx, mask_ratio=0.9, patch_size=8,
                                      norm_pix_loss=True,
                                      compute_dtype=jnp.bfloat16)
        rng = np.random.default_rng(0)
        key = jax.random.key(1)
        losses = []
        t0 = time.time()
        for _ in range(args.steps):
            idx = rng.integers(0, len(clips), B)
            key, k = jax.random.split(key)
            state, m = step_fn(state, {"clip": jnp.asarray(clips[idx])}, k)
            losses.append(float(m["loss"]))
        print(f"[{attn_impl}] {time.time() - t0:.0f}s "
              f"loss {losses[0]:.4f} -> {losses[-1]:.4f}", flush=True)
        return np.asarray(losses)

    lp = run("pallas")
    lx = run("xla")
    rel = np.abs(lp - lx) / np.maximum(np.abs(lx), 1e-9)
    print(f"max relative loss deviation over {args.steps} steps: "
          f"{rel.max():.4%} (mean {rel.mean():.4%})")
    print("pallas:", " ".join(f"{v:.3f}" for v in lp[::10]))
    print("xla:   ", " ".join(f"{v:.3f}" for v in lx[::10]))


if __name__ == "__main__":
    main()
