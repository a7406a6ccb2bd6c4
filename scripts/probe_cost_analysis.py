"""Cross-check the analytic pipeline-B FLOP model against XLA's own
cost_analysis (VERDICT r3 #5/#4: the committed MFU figure rested on
utils/metrics.pipeline_b_flops_per_clip alone).

Lowers and compiles the EXACT bench.py train step (same builders, same
shapes) and reads compiled.cost_analysis()['flops'], then prints both
numbers and their ratio. Note XLA counts the executed HLO after fusion and
rematerialization choices, and counts a transcendental as 1 flop — exact
agreement is not expected; same-ballpark (within ~1.3x) validates the MFU
denominator.

Run (chip): python scripts/probe_cost_analysis.py
CPU smoke:  JAX_PLATFORM_NAME=cpu python scripts/probe_cost_analysis.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import ssl_vit_video_analytics_tpu  # noqa: F401  (flips jax to CPU when JAX_PLATFORM_NAME=cpu — works offline)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    on_tpu = jax.default_backend() == "tpu"
    from ssl_vit_video_analytics_tpu.entry.train_ssl_mae import build_model
    from ssl_vit_video_analytics_tpu.train.mae_engine import make_pixel_mae_step
    from ssl_vit_video_analytics_tpu.train.state import (create_train_state,
                                                         make_optimizer)
    from ssl_vit_video_analytics_tpu.utils.config import load_config
    from ssl_vit_video_analytics_tpu.utils.metrics import (
        pipeline_b_flops_per_clip, pipeline_b_model_kwargs)

    cfg = load_config("configs/ssl_mae.yaml", base="configs/base.yaml")
    if not on_tpu:
        cfg["dataset"].update(clip_len=4, image_size=32)
        cfg["model"].update(embed_dims=[8, 16, 24, 32], decoder_embed_dim=16,
                            decoder_depth=1, decoder_num_heads=2)
        cfg["training"]["batch_size"] = 2

    B = int(os.environ.get("BENCH_BATCH", 16 if on_tpu else 2))
    T = int(cfg["dataset"]["clip_len"])
    S = int(cfg["dataset"]["image_size"])
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    cfg["model"]["use_checkpoint"] = False
    model = build_model(cfg, dtype)

    rng = jax.random.key(0)
    clip0 = jnp.zeros((B, T, S, S, 3), jnp.float32)
    L = (S // 8) ** 2
    variables = jax.jit(lambda k: model.init(k, clip0, jnp.zeros((B, T, L), bool)))(rng)
    tx = make_optimizer(1e-3, weight_decay=0.05, grad_clip=None)
    state = create_train_state(variables["params"], tx,
                               batch_stats=variables.get("batch_stats"))
    step_fn = make_pixel_mae_step(model, tx, mask_ratio=0.9, patch_size=8,
                                  norm_pix_loss=True, compute_dtype=dtype)

    batch = {"clip": jax.device_put(
        np.zeros((B, T, S, S, 3), dtype=np.uint8))}
    print("lowering + compiling the bench train step...", flush=True)
    compiled = step_fn.lower(state, batch, rng).compile()  # step_fn is jitted
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    xla_flops = float(ca.get("flops", float("nan")))
    xla_bytes = float(ca.get("bytes accessed", float("nan")))
    analytic = pipeline_b_flops_per_clip(T, S, **pipeline_b_model_kwargs(cfg))
    print(f"XLA cost_analysis flops/step: {xla_flops:.4g} "
          f"({xla_flops / B:.4g}/clip)")
    print(f"analytic train flops/clip:    {analytic:.4g}")
    print(f"ratio xla/analytic:           {xla_flops / B / analytic:.3f}")
    # Reconciliation: on TPU the attention score/value matmuls live inside
    # the pallas flash-attention CUSTOM CALL, which XLA's cost_analysis
    # counts as 0 flops. The analytic model's attention share is the
    # 4*tokens^2*dim term per tblock (utils/metrics._tblock_flops), x3 for
    # fwd+bwd — subtract it and the two counts should agree closely.
    mk = pipeline_b_model_kwargs(cfg)
    d1, d2 = mk["embed_dims"][1], mk["embed_dims"][2]
    dd, ddepth = mk["decoder_embed_dim"], mk["decoder_depth"]
    r1, r2 = S // 4, S // 8
    attn_fwd = (2 * 4.0 * (r1 * r1) ** 2 * d1 * T        # stage-2 x2/frame
                + 6 * 4.0 * (r2 * r2) ** 2 * d2 * T      # stage-3 x6/frame
                + ddepth * 4.0 * (T * r2 * r2) ** 2 * dd)  # decoder/clip
    non_attn = analytic - 3.0 * attn_fwd
    print(f"analytic attention (pallas-resident) share: {3 * attn_fwd:.4g}"
          f"/clip; analytic NON-attention {non_attn:.4g}/clip "
          f"-> ratio vs XLA {non_attn / (xla_flops / B):.3f} "
          "(~1.0 = denominator validated; XLA excludes custom-call flops)")
    if np.isfinite(xla_bytes):
        print(f"XLA bytes accessed/step:      {xla_bytes / 1e9:.2f} GB "
              f"(arithmetic intensity {xla_flops / xla_bytes:.1f} flop/B)")


if __name__ == "__main__":
    main()
