"""d=128 decoder head repack probe (VERDICT r3 #4b).

The pipeline-B decoder runs 6 heads of d=64 over T*196=3136 tokens
(ref: src/models/mae_vit_adapter.py:40-48 uses nhead=6 at decoder_dim 384).
MXU lanes are 128-wide, so d=64 heads *look* half-empty — but the packed
flash kernel already fixes that with head-group packing: gs = 128 // d = 2
heads per matmul, i.e. 6x64 runs as 3 groups of K-width 128, the exact same
matmul shapes as a native 3x128 head layout. This probe measures what is
left on the table by the 6x64 layout:

  (a) step time, decoder_num_heads=6 (d=64, grouped) vs 3 (d=128, native),
      full pipeline-B train step at production shapes;
  (b) loss-trajectory comparison from IDENTICAL init (the qkv/proj Dense
      shapes are head-count independent: [D, 3D] packed), so the repack is
      purely a different attention function over the same parameter space —
      cross-validated like pallas-vs-xla (probe_kernel_xval.py).

Opt-in: the repack is just `--set model.decoder_num_heads=3` on
entry.train_ssl_mae; nothing else changes.

Run (chip): python scripts/probe_decoder_repack.py [--steps 60]
"""
from __future__ import annotations

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import ssl_vit_video_analytics_tpu  # noqa: F401  (flips jax to CPU when JAX_PLATFORM_NAME=cpu — works offline)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--data", default="/tmp/ssl_campaign/data",
                   help="hard-fixture root (scripts/mae_evidence.py default)")
    p.add_argument("--reverse", action="store_true",
                   help="run 3x128 first (order-effect control: the second "
                        "arm of a tunnel probe tends to read ~35-40 ms "
                        "faster)")
    args = p.parse_args()

    from ssl_vit_video_analytics_tpu.entry.train_ssl_mae import build_model
    from ssl_vit_video_analytics_tpu.train.mae_engine import (
        make_pixel_mae_step, wrap_accum_and_skip)
    from ssl_vit_video_analytics_tpu.train.state import (
        create_train_state, make_optimizer, warmup_cosine_schedule)

    if jax.default_backend() != "tpu":
        raise SystemExit("chip-only probe: production 112^2 shapes are not "
                         "meaningful (or tractable) on the 1-core CPU host")

    B, T, S = args.batch, 16, 112
    paths = sorted(glob.glob(os.path.join(args.data, "class*/vid*/packed_112.npy")))[:64]
    if not paths:
        raise SystemExit(f"no packed fixture under {args.data}; run "
                         "scripts/mae_evidence.py once to create it")
    clips = np.stack([np.load(p_) for p_ in paths])

    def run(num_heads):
        cfg = {"model": {"type": "tiny_vit_21m_variant",
                         "embed_dims": [96, 192, 384, 576],
                         "decoder_embed_dim": 384, "decoder_depth": 4,
                         "decoder_num_heads": num_heads,
                         "use_checkpoint": False},
               "dataset": {"clip_len": T, "image_size": S}}
        model = build_model(cfg, jnp.bfloat16)
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
        # warmup/compile outside the timed window. step_fn DONATES its
        # state arg — continue from the returned state (reusing the donated
        # one surfaces as an async INVALID_ARGUMENT through the axon tunnel)
        k0 = jax.random.key(2)
        state, m_w = step_fn(state, {"clip": jnp.asarray(clips[:B])}, k0)
        float(m_w["loss"])
        t0 = time.time()
        for _ in range(args.steps):
            idx = rng.integers(0, len(clips), B)
            key, k = jax.random.split(key)
            state, m = step_fn(state, {"clip": jnp.asarray(clips[idx])}, k)
            losses.append(m["loss"])  # device scalar ref, no host fetch
        # ONE host sync closes the timed window (steps chain through state);
        # a per-step float() costs ~130 ms/step through the tunnel
        # (CLAUDE.md) and poisons the A/B
        float(losses[-1])
        dt = (time.time() - t0) / args.steps * 1e3
        losses = [float(v) for v in losses]
        print(f"[heads={num_heads} d={384 // num_heads}] {dt:.1f} ms/step "
              f"({B / dt * 1e3:.1f} clips/s) "
              f"loss {losses[0]:.4f} -> {losses[-1]:.4f}", flush=True)
        return np.asarray(losses), dt

    if args.reverse:
        l3, t3 = run(3)
        l6, t6 = run(6)
    else:
        l6, t6 = run(6)
        l3, t3 = run(3)
    rel = np.abs(l3 - l6) / np.maximum(np.abs(l6), 1e-9)
    print(f"step time: 6x64 {t6:.1f} ms vs 3x128 {t3:.1f} ms "
          f"({(t6 - t3) / t6 * 100:+.1f}% from repack)")
    print(f"trajectory deviation (different attention fn, same init): "
          f"max {rel.max():.2%}, mean {rel.mean():.2%}")
    print("6x64: ", " ".join(f"{v:.3f}" for v in l6[::10]))
    print("3x128:", " ".join(f"{v:.3f}" for v in l3[::10]))


if __name__ == "__main__":
    main()
