"""AOT serving export: serialize the classifier forward as a StableHLO
artifact (jax.export) that serves WITHOUT the model code or checkpoint.

Beyond-reference deployment path (the reference serves by re-instantiating
torch modules + load_state_dict in every consumer — src/run_dynamic.py:20-42,
src/run_privacy.py:27-53): here the trained `VideoClassifier` forward is
traced once with the variables baked in as constants, lowered to StableHLO,
and serialized to one self-contained file. A serving host deserializes and
calls it — no flax, no checkpoint tree, no model config drift between
training and serving. The batch dimension is exported SYMBOLICALLY so one
artifact serves any batch size.

Notes:
  - Exported with the XLA attention path (portable StableHLO custom-call-
    free); the pallas kernel is a training-throughput optimization and the
    two are trajectory-equivalent (scripts/probe_kernel_xval.py).
  - The artifact pins dtype + input rank/shape (except batch) and the
    target platform of the exporting process. Export on the platform you
    serve on (or pass --platforms).

Usage:
  python -m tools.export_serving --config configs/dynamic.yaml \
      --out results/classifier.jaxexport            # export (ckpt from cfg)
  python -m tools.export_serving --load results/classifier.jaxexport \
      --batch 8                                     # smoke/bench a served fn
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import ssl_vit_video_analytics_tpu  # noqa: F401  (honors JAX_PLATFORM_NAME)

import jax
import jax.numpy as jnp
import numpy as np


def export_classifier(cfg: dict, dtype=jnp.float32, platforms=None,
                      log=print) -> bytes:
    """Build + restore the classifier from ``cfg`` (same schema as
    entry.run_dynamic), bake variables in, export with a symbolic batch."""
    from ssl_vit_video_analytics_tpu.ops import attention as attn_mod
    from ssl_vit_video_analytics_tpu.train import finetune_engine as eng
    from ssl_vit_video_analytics_tpu.utils.checkpoint import restore_checkpoint

    ds, m = cfg["dataset"], cfg["model"]
    T, S = int(ds["clip_len"]), int(ds["image_size"])
    model = eng.build_model(int(ds["num_classes"]), int(m["embed_dim"]),
                            dtype=dtype,
                            backbone=str(m.get("backbone", "mobilevit_s")))
    variables = eng.init_model(model, jax.random.key(0), (1, T, S, S, 3))
    ckpt = m.get("finetune_ckpt")
    if ckpt and os.path.exists(ckpt):
        blob = restore_checkpoint(ckpt)
        variables = {"params": blob["params"],
                     "batch_stats": blob.get("batch_stats")}
        log(f"[INFO] baked checkpoint: {ckpt}")
    else:
        log(f"[WARN] finetune ckpt not found ({ckpt}); exporting random "
            "weights (smoke artifact)")

    prev = attn_mod._DEFAULT_IMPL
    attn_mod.set_default_impl("xla")  # portable, custom-call-free StableHLO
    try:
        fn = jax.jit(lambda clip: model.apply(variables, clip, train=False))
        (b,) = jax.export.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((b, T, S, S, 3), jnp.float32)
        kwargs = {"platforms": platforms} if platforms else {}
        exp = jax.export.export(fn, **kwargs)(spec)
    finally:
        attn_mod.set_default_impl(prev)
    return exp.serialize()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None, help="task YAML (run_dynamic schema)")
    p.add_argument("--base", default="configs/base.yaml")
    p.add_argument("--set", nargs="*", default=[], help="dotted overrides")
    p.add_argument("--out", default="results/classifier.jaxexport")
    p.add_argument("--platforms", nargs="*", default=None,
                   help="e.g. --platforms cpu tpu (default: current backend)")
    p.add_argument("--load", default=None, help="artifact to deserialize+run")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    if args.load:
        exp = jax.export.deserialize(open(args.load, "rb").read())
        (_, T, S, _, _) = exp.in_avals[0].shape
        clip = np.random.default_rng(0).standard_normal(
            (args.batch, int(T), int(S), int(S), 3)).astype(np.float32)
        logits = np.asarray(exp.call(clip))
        print(f"[serve] {args.load}: in {clip.shape} -> logits {logits.shape}, "
              f"finite={np.isfinite(logits).all()}")
        t0 = time.time()
        for _ in range(args.iters):
            float(np.asarray(exp.call(clip))[0, 0])  # host sync per call
        dt = (time.time() - t0) / args.iters * 1e3
        print(f"[serve] {dt:.2f} ms/batch ({dt / args.batch:.2f} ms/clip, "
              f"batch {args.batch}, {args.iters} iters)")
        return

    from ssl_vit_video_analytics_tpu.utils.config import load_config
    cfg = load_config(args.config, base=args.base or None,
                      overrides=args.set)
    blob = export_classifier(cfg, platforms=args.platforms)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"[export] wrote {args.out} ({len(blob) / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
