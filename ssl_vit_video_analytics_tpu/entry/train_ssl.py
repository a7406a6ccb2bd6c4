"""SSL pipeline A CLI: EMA teacher-student MFM + VICReg + TOP
(reference: src/train_ssl.py).

Usage:
  python -m ssl_vit_video_analytics_tpu.entry.train_ssl --config configs/ssl_train.yaml
"""
from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp

from ..models import TemporalSSL
from ..train.ssl_engine import make_ssl_step
from ..train.state import create_train_state, make_optimizer, warmup_cosine_schedule
from ..utils.checkpoint import save_checkpoint
from ..utils.io import ensure_dir, append_csv_row
from ..utils.metrics import format_metrics
from ..utils.prng import set_seed
from . import common


def run(cfg: dict, log=print, max_steps: int | None = None) -> dict:
    seed = int(cfg.get("seed", 42))
    root_key = set_seed(seed)
    dtype = common.compute_dtype_from(cfg)

    ds = common.dataset_from_cfg(cfg, common.split_path(cfg, cfg["dataset"]["train_split"]),
                                 "ssl", seed=seed)
    tr = cfg["training"]
    ssl = cfg["ssl_objectives"]
    m = cfg["model"]
    B = int(tr["batch_size"])
    T, S = ds.clip_len, ds.image_size
    steps_per_epoch = max(1, len(ds) // B)
    epochs = int(tr["epochs"])

    model = TemporalSSL(
        embed_dim=int(m.get("embed_dim", 256)),
        layers=int(m.get("temporal_layers", 4)),
        heads=int(m.get("temporal_heads", 4)),
        clip_len=T, dtype=dtype)
    clip0 = jnp.zeros((B, T, S, S, 3), jnp.float32)
    init_key, step_key = jax.random.split(root_key)
    variables = jax.jit(lambda k: model.init(k, clip0, method="init_all"))(init_key)
    log(f"[INFO] train_ssl: params="
        f"{sum(x.size for x in jax.tree.leaves(variables['params'])) / 1e6:.2f}M")

    sch_cfg = tr.get("scheduler", {}) or {}
    if sch_cfg.get("enable", True):
        lr = warmup_cosine_schedule(
            float(tr["learning_rate"]),
            int(sch_cfg.get("warmup_epochs", 0)) * steps_per_epoch,
            epochs * steps_per_epoch,
            float(tr["learning_rate"]) * float(sch_cfg.get("eta_min_ratio", 0.0)))
    else:
        lr = float(tr["learning_rate"])
    tx = make_optimizer(lr, weight_decay=float(tr.get("weight_decay", 0.05)),
                        # reference clips only when the config sets the key
                        # (src/train_ssl.py:258-259); ssl_train.yaml sets 1.0
                        grad_clip=tr.get("clip_grad_norm"))
    state = create_train_state(
        variables["params"], tx, batch_stats=variables.get("batch_stats"),
        ema_params=jax.tree.map(jnp.copy, variables["params"]))  # EMA teacher init = student
    # Multi-chip dp: batch sharded over the data axis, params (incl. EMA)
    # replicated; XLA all-reduces the grads, the EMA update stays local math
    # on replicated trees (same pattern as train_ssl_mae.py).
    mesh, batch_sharding, place_state = common.setup_data_parallel(cfg, B, log)
    state = place_state(state)
    ds = common.maybe_device_resident(cfg, ds, log, sharding=batch_sharding)

    # Two compiled variants: with and without the TOP objective (the
    # reference gates TOP by epoch and step, ref: src/train_ssl.py:185,224).
    step_plain = make_ssl_step(model, tx, ssl, with_top=False, compute_dtype=dtype)
    step_top = make_ssl_step(model, tx, ssl, with_top=True, compute_dtype=dtype)
    top_start = int(ssl.get("top_start_epoch", 1))
    top_every = max(1, int(ssl.get("top_every", 1)))

    save_dir = tr.get("save_dir", "results/ema_ssl_vicreg")
    ensure_dir(save_dir)
    save_every = int(tr.get("save_every", 10))
    log_interval = int(tr.get("log_interval", 20))

    global_step = 0
    running: dict = {}
    for epoch in range(1, epochs + 1):
        top_enabled = epoch >= top_start
        t_ep = time.perf_counter()
        for step, batch in enumerate(
                common.epoch_batches(ds, B, shuffle=True, seed=seed, epoch=epoch,
                                     sharding=batch_sharding), 1):
            step_key, k = jax.random.split(step_key)
            use_top = top_enabled and (step % top_every == 0)
            state, metrics = (step_top if use_top else step_plain)(state, batch, k)
            global_step += 1
            for k2, v in metrics.items():
                running[k2] = running.get(k2, 0.0) + float(v)
            running["n"] = running.get("n", 0) + 1
            if step % log_interval == 0:
                n = running["n"]
                avg = {k2: v / n for k2, v in running.items() if k2 != "n"}
                log(f"[INFO] ep={epoch} step={step}/{steps_per_epoch} "
                    + format_metrics(avg)
                    + f" (top_on={'Y' if top_enabled else 'N'} every={top_every})")
            if max_steps is not None and global_step >= max_steps:
                break
        n = max(1, running.get("n", 1))
        epoch_avg = {k2: v / n for k2, v in running.items() if k2 != "n"}
        log(f"[INFO] Epoch done. ep={epoch} " + format_metrics(epoch_avg)
            + f" ({time.perf_counter() - t_ep:.1f}s)")
        append_csv_row(os.path.join(save_dir, "ssl_metrics.csv"), {
            "epoch": epoch,
            "total": round(epoch_avg.get("loss", 0.0), 6),
            "mfm": round(epoch_avg.get("mfm", 0.0), 6),
            "var": round(epoch_avg.get("var", 0.0), 6),
            "top": round(epoch_avg.get("top", 0.0), 6),
        }, fieldnames=["epoch", "total", "mfm", "var", "top"])
        running = {}
        if epoch % save_every == 0 or epoch == epochs:
            # {student, ema, opt} like the reference's periodic saves
            # (ref: src/train_ssl.py:354-362)
            path = save_checkpoint(save_dir, f"ssl_epoch_{epoch}", {
                "params": state.params,
                "ema_params": state.ema_params,
                "batch_stats": state.batch_stats,
                "opt_state": state.opt_state,
                "step": int(state.step),
                "epoch": epoch,
            }, meta={"has_opt_state": True})
            log(f"[INFO] saved checkpoint: {path}")
        if max_steps is not None and global_step >= max_steps:
            break
    return {"steps": global_step, "save_dir": save_dir}


def main():
    p = common.make_parser("EMA teacher-student SSL pretraining (pipeline A)")
    args = p.parse_args()
    cfg = common.load_merged_config(args, "configs/ssl_train.yaml")
    logger = common.make_logger(cfg, "train_ssl")
    run(cfg, log=logger.log)


if __name__ == "__main__":
    main()
