"""Standalone evaluation CLI.

The reference ships an EMPTY src/evaluate.py placeholder (SURVEY.md §2.1);
this is the real thing: load a finetuned checkpoint, evaluate top-k on a
split, optionally measure per-clip latency, write one CSV row.

Usage:
  python -m ssl_vit_video_analytics_tpu.entry.evaluate \
      --config configs/finetune.yaml --ckpt results/finetune/two_stage/best \
      --split UCF101_val.txt
"""
from __future__ import annotations

import os
import time

import jax
import numpy as np

from ..train import finetune_engine as eng
from ..train.state import create_train_state, make_optimizer
from ..utils.checkpoint import restore_checkpoint
from ..utils.io import write_csv, ensure_dir
from ..utils.prng import set_seed
from . import common


def run(cfg: dict, ckpt: str | None, split: str | None, log=print,
        measure_latency: bool = True) -> dict:
    seed = int(cfg.get("seed", 42))
    set_seed(seed)
    dtype = common.compute_dtype_from(cfg)
    d = cfg["dataset"]
    split_file = common.split_path(cfg, split or d.get("val_split", d.get("split")))
    ds = common.dataset_from_cfg(cfg, split_file, "supervised", seed=seed + 999)
    ds = common.maybe_device_resident(cfg, ds, log)
    B = int(cfg.get("training", cfg.get("runtime", {})).get("batch_size", 8))

    model = eng.build_model(int(d["num_classes"]), int(cfg["model"]["embed_dim"]),
                            dtype=dtype,
                            backbone=str(cfg["model"].get("backbone", "mobilevit_s")))
    variables = eng.init_model(model, jax.random.key(0),
                               (B, ds.clip_len, ds.image_size, ds.image_size, 3))
    if ckpt and os.path.exists(ckpt):
        blob = restore_checkpoint(ckpt)
        variables = {"params": blob["params"], "batch_stats": blob.get("batch_stats")}
        log(f"[INFO] loaded {ckpt}")
    else:
        log(f"[WARN] checkpoint not found ({ckpt}); evaluating random weights")

    state = create_train_state(variables["params"], make_optimizer(1e-3),
                               batch_stats=variables.get("batch_stats"))
    eval_step = eng.make_eval_step(model, compute_dtype=dtype)
    topk = tuple(cfg.get("evaluation", {}).get("topk", [1, 5]))

    t0 = time.perf_counter()
    acc = eng.evaluate(eval_step, state,
                       common.epoch_batches(ds, B, shuffle=False, seed=0, epoch=0,
                                            drop_last=False), ks=topk)
    wall = time.perf_counter() - t0

    lat_ms = ""
    if measure_latency:
        batch = next(iter(common.epoch_batches(ds, B, shuffle=False, seed=0, epoch=0)))
        np.asarray(eval_step(state, batch))  # warm
        times = []
        for _ in range(10):
            t0 = time.perf_counter()
            np.asarray(eval_step(state, batch))
            times.append((time.perf_counter() - t0) * 1000)
        lat_ms = f"{float(np.median(times)):.3f}"

    row = {"split": split_file, "n_samples": len(ds),
           **{f"top{k}": f"{acc[f'top{k}']:.6f}" for k in topk},
           "p50_batch_latency_ms": lat_ms, "batch_size": B,
           "eval_seconds": f"{wall:.1f}", "ckpt": ckpt or ""}
    log("[INFO] " + " ".join(f"{k}={v}" for k, v in row.items() if k != "ckpt"))
    out_dir = ensure_dir(cfg.get("paths", {}).get("result_dir", "results"))
    out_csv = os.path.join(out_dir, "evaluate.csv")
    write_csv(out_csv, [row])
    log(f"[INFO] wrote {out_csv}")
    return {"acc": acc, "csv": out_csv}


def main():
    p = common.make_parser("Standalone checkpoint evaluation")
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--split", type=str, default=None)
    p.add_argument("--no-latency", action="store_true")
    args = p.parse_args()
    cfg = common.load_merged_config(args, "configs/finetune.yaml")
    logger = common.make_logger(cfg, "evaluate")
    run(cfg, args.ckpt or cfg.get("model", {}).get("finetune_ckpt"),
        args.split, log=logger.log, measure_latency=not args.no_latency)


if __name__ == "__main__":
    main()
