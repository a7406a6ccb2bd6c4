"""MoE decoder on the real chip: dense vs top-1 MoE A/B at production shapes.

The opt-in MoE decoder (models/layers.MoeMlp, model.decoder_moe_experts)
is a beyond-reference capacity knob: E experts = ~E x the decoder-MLP
parameters at roughly constant per-token FLOPs (top-1 routing). Multi-device
expert sharding (parallel/ep.py) is validated on the 8-way virtual mesh
(tests/test_ep.py + dryrun regime 8); this probe answers the two questions
only the real chip can: does the grouped one-hot dispatch path run well on
TPU at production shapes, and what does the routing machinery cost vs the
dense MLP?

Shapes: pipeline-B decoder, 3136 tokens x 384 dim, B=16, bf16, E=4 experts,
group_size=392 (8 groups/clip — bounds the [G,S,E,C] dispatch one-hot;
see MoeMlp docstring), capacity_factor 1.25.

Run (chip): python scripts/probe_moe_chip.py [--steps 40]
"""
from __future__ import annotations

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import ssl_vit_video_analytics_tpu  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--steps", type=int, default=40)
    p.add_argument("--experts", type=int, default=4)
    p.add_argument("--group", type=int, default=392)
    p.add_argument("--capacity", type=float, default=1.25)
    p.add_argument("--data", default="/tmp/ssl_campaign/data")
    args = p.parse_args()

    from ssl_vit_video_analytics_tpu.entry.train_ssl_mae import build_model
    from ssl_vit_video_analytics_tpu.train.mae_engine import (
        make_pixel_mae_step, wrap_accum_and_skip)
    from ssl_vit_video_analytics_tpu.train.state import (
        create_train_state, make_optimizer, warmup_cosine_schedule)

    if jax.default_backend() != "tpu":
        raise SystemExit("chip-only probe")

    B, T, S = args.batch, 16, 112
    paths = sorted(glob.glob(os.path.join(args.data, "class*/vid*/packed_112.npy")))[:64]
    if not paths:
        raise SystemExit(f"no packed fixture under {args.data}")
    clips = np.stack([np.load(p_) for p_ in paths])

    def run(moe: bool):
        m = {"type": "tiny_vit_21m_variant", "embed_dims": [96, 192, 384, 576],
             "decoder_embed_dim": 384, "decoder_depth": 4,
             "decoder_num_heads": 6, "use_checkpoint": False}
        if moe:
            m.update(decoder_moe_experts=args.experts,
                     decoder_moe_capacity_factor=args.capacity,
                     decoder_moe_group_size=args.group)
        cfg = {"model": m, "dataset": {"clip_len": T, "image_size": S}}
        model = build_model(cfg, jnp.bfloat16)
        L = (S // 8) ** 2
        variables = jax.jit(lambda k: model.init(
            k, jnp.zeros((1, T, S, S, 3), jnp.float32),
            jnp.zeros((1, T, L), bool)))(jax.random.key(0))
        n_par = sum(x.size for x in jax.tree.leaves(variables["params"]))
        sched = warmup_cosine_schedule(5e-4, 10, args.steps, 0.0)
        tx = wrap_accum_and_skip(
            make_optimizer(sched, weight_decay=0.05, grad_clip=None), 1)
        state = create_train_state(variables["params"], tx,
                                   batch_stats=variables.get("batch_stats"))
        step_fn = make_pixel_mae_step(model, tx, mask_ratio=0.9, patch_size=8,
                                      norm_pix_loss=True,
                                      compute_dtype=jnp.bfloat16,
                                      # production path: load-balance aux on
                                      moe_aux_weight=0.01 if moe else 0.0)
        rng = np.random.default_rng(0)
        key = jax.random.key(1)
        # step_fn DONATES its state arg — continue from the returned state
        state, m_w = step_fn(state, {"clip": jnp.asarray(clips[:B])},
                             jax.random.key(2))
        float(m_w["loss"])  # sync through the tunnel
        losses = []
        t0 = time.time()
        for _ in range(args.steps):
            idx = rng.integers(0, len(clips), B)
            key, k = jax.random.split(key)
            state, mtr = step_fn(state, {"clip": jnp.asarray(clips[idx])}, k)
            losses.append(mtr["loss"])  # device scalar ref, no host fetch
        # ONE host sync closes the timed window (steps chain through state,
        # so the last loss arriving means all steps ran) — a per-step
        # float() costs ~130 ms/step through the tunnel (CLAUDE.md) and
        # poisons the A/B
        float(losses[-1])
        dt = (time.time() - t0) / args.steps * 1e3
        losses = [float(v) for v in losses]
        tag = (f"moe E={args.experts} S={args.group} cf={args.capacity}"
               if moe else "dense")
        print(f"[{tag}] params={n_par / 1e6:.2f}M {dt:.1f} ms/step "
              f"({B / dt * 1e3:.1f} clips/s) "
              f"loss {losses[0]:.4f} -> {losses[-1]:.4f}", flush=True)
        return dt

    t_dense = run(False)
    t_moe = run(True)
    print(f"MoE routing+capacity overhead at constant top-1 FLOPs: "
          f"{t_moe - t_dense:+.1f} ms/step ({(t_moe / t_dense - 1) * 100:+.1f}%)")


if __name__ == "__main__":
    main()
