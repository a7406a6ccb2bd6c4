"""Supervised action-recognition finetune CLI (reference: src/train_finetune.py).

Four modes (ft_random / linear_probe / ft_ssl / two_stage) with two-stage
freeze->unfreeze, per-group LRs, best-top1 checkpointing with metric-encoded
names (finetune_epoch_{e}_top1_{acc:.4f}), and the same log line shapes.

Usage:
  python -m ssl_vit_video_analytics_tpu.entry.train_finetune \
      --config configs/finetune.yaml --mode two_stage
"""
from __future__ import annotations

import os
import time

import jax

from ..ops.augment import augment_from_cfg
from ..train import finetune_engine as eng
from ..train.state import create_train_state
from ..utils.checkpoint import save_checkpoint, restore_checkpoint, best_ckpt_name
from ..utils.io import ensure_dir, append_csv_row
from ..utils.prng import set_seed
from . import common


def run(cfg: dict, mode: str | None = None, log=print) -> dict:
    """Programmatic entry; returns {"best_top1": float, "best_ckpt": path}."""
    mode = eng.resolve_mode(cfg, mode)
    seed = int(cfg.get("seed", 42))
    root_key = set_seed(seed)
    dtype = common.compute_dtype_from(cfg)
    log(f"[INFO] Finetune mode: {mode} (backend={jax.default_backend()}, dtype={dtype.__name__})")

    d = cfg["dataset"]
    train_ds = common.dataset_from_cfg(cfg, common.split_path(cfg, d["train_split"]),
                                       "supervised", seed=seed)
    val_ds = common.dataset_from_cfg(cfg, common.split_path(cfg, d["val_split"]),
                                     "supervised", seed=seed + 999)

    tr = cfg["training"]
    B = int(tr["batch_size"])
    T = train_ds.clip_len
    S = train_ds.image_size
    num_classes = int(d["num_classes"])

    backbone = str(cfg["model"].get("backbone", "mobilevit_s"))
    model = eng.build_model(num_classes, int(cfg["model"]["embed_dim"]), dtype=dtype,
                            backbone=backbone,
                            backbone_kwargs=cfg["model"].get("backbone_kwargs"))
    if backbone not in ("mobilevit_s", "mobilevit"):
        log(f"[INFO] backbone: {backbone} (MAE-pretrained transfer path)")
    init_key, _ = jax.random.split(root_key)
    variables = eng.init_model(model, init_key, (B, T, S, S, 3))

    if mode != "ft_random":
        ssl_path = cfg["model"].get("pretrained_ssl")
        if ssl_path and os.path.exists(ssl_path):
            ssl_vars = restore_checkpoint(ssl_path)
            if isinstance(ssl_vars, dict) and "params" in ssl_vars:
                variables = eng.load_pretrained_ssl(variables, ssl_vars)
                log(f"[INFO] Loaded SSL pretrain from {ssl_path}")
        elif ssl_path:
            # A path was given but does not exist: hard-fail like the reference
            # (src/train_finetune.py:288-290). A silent random-init fallback here
            # would let campaign queues commit random-init results as SSL-transfer
            # evidence (a real near-miss: round-4 queue 14 launched ft_ssl off a
            # checkpoint a 4h-timeout could have skipped).
            raise FileNotFoundError(
                f"[ERROR] mode={mode} requires model.pretrained_ssl, but "
                f"{ssl_path!r} does not exist. Set model.pretrained_ssl=null "
                "explicitly to accept random init (smoke runs only).")
        else:
            log(f"[WARN] pretrained_ssl unset; mode={mode} continuing from random init")

    stage1_epochs = int(tr.get("stage1_epochs", 0))
    two_stage = mode == "two_stage"
    if two_stage and stage1_epochs <= 0:
        raise ValueError("[ERROR] two_stage requires training.stage1_epochs > 0")
    freeze_backbone = (mode == "linear_probe") or two_stage

    tx = eng.build_finetune_tx(tr, mode, variables["params"], freeze_backbone)
    state = create_train_state(variables["params"], tx,
                               batch_stats=variables.get("batch_stats"))
    mesh, batch_sharding, place_state = common.setup_data_parallel(cfg, B, log)
    state = place_state(state)
    train_ds = common.maybe_device_resident(cfg, train_ds, log, sharding=batch_sharding)
    val_ds = common.maybe_device_resident(cfg, val_ds, log, sharding=batch_sharding)
    augment = augment_from_cfg(tr)
    if augment is not None:
        log("[INFO] on-device augmentation enabled (training.augment)")
    train_step = eng.make_train_step(model, tx, compute_dtype=dtype, seed=seed,
                                     augment=augment)
    eval_step = eng.make_eval_step(model, compute_dtype=dtype)

    epochs = int(tr["epochs"])
    topk = tuple(cfg.get("evaluation", {}).get("topk", [1, 5]))
    log_interval = int(tr.get("log_interval", 20))
    save_dir = os.path.join(cfg.get("paths", {}).get("save_dir", "results/finetune"), mode)
    ensure_dir(save_dir)

    best_top1, best_ckpt = 0.0, None
    for epoch in range(1, epochs + 1):
        if two_stage and epoch == stage1_epochs + 1:
            log("[INFO] two_stage: unfreeze backbone and rebuild optimizer")
            tx = eng.build_finetune_tx(tr, mode, state.params, freeze_backbone=False)
            state = place_state(
                create_train_state(state.params, tx, batch_stats=state.batch_stats))
            train_step = eng.make_train_step(model, tx, compute_dtype=dtype, seed=seed,
                                             augment=augment)

        log(f"[INFO] Epoch {epoch}/{epochs} started")
        t0 = time.perf_counter()
        n_steps, loss_sum = 0, 0.0
        for step, batch in enumerate(
                common.epoch_batches(train_ds, B, shuffle=True, seed=seed, epoch=epoch,
                                     sharding=batch_sharding), 1):
            state, metrics = train_step(state, batch)
            n_steps += 1
            loss_sum += float(metrics["loss"])
            if step % log_interval == 0:
                log(f"[INFO] ep={epoch} step={step} loss={float(metrics['loss']):.4f} "
                    f"top1={float(metrics['top1']):.4f}")
        dt = time.perf_counter() - t0
        log(f"[INFO] Epoch {epoch} done in {dt:.1f}s avg_loss={loss_sum / max(n_steps, 1):.4f}")

        acc = eng.evaluate(eval_step,
                           state,
                           common.epoch_batches(val_ds, B, shuffle=False, seed=seed,
                                                epoch=0, drop_last=False),
                           ks=topk)
        log(f"[INFO] val " + " ".join(f"top{k}={acc[f'top{k}']:.4f}" for k in topk))
        append_csv_row(os.path.join(save_dir, "metrics.csv"), {
            "epoch": epoch, "mode": mode,
            "train_loss": round(loss_sum / max(n_steps, 1), 6),
            **{f"val_top{k}": round(acc[f"top{k}"], 6) for k in topk},
        }, fieldnames=["epoch", "mode", "train_loss"] + [f"val_top{k}" for k in topk])

        if acc["top1"] > best_top1:
            best_top1 = acc["top1"]
            name = best_ckpt_name("finetune", epoch, "top1", best_top1)
            best_ckpt = save_checkpoint(save_dir, name, {
                "params": state.params, "batch_stats": state.batch_stats,
            })
            # stable alias consumed by configs/dynamic.yaml-style paths
            save_checkpoint(save_dir, "best", {
                "params": state.params, "batch_stats": state.batch_stats,
            })
            log(f"[INFO] Saved checkpoint: {best_ckpt}")

    return {"best_top1": best_top1, "best_ckpt": best_ckpt}


def main():
    p = common.make_parser("Supervised finetune")
    p.add_argument("--mode", type=str, default=None,
                   help="ft_random | linear_probe | ft_ssl | two_stage")
    args = p.parse_args()
    cfg = common.load_merged_config(args, "configs/finetune.yaml")
    logger = common.make_logger(cfg, f"finetune_{args.mode or 'cfg'}")
    run(cfg, mode=args.mode, log=logger.log)


if __name__ == "__main__":
    main()
