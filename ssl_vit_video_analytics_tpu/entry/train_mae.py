"""SSL pipeline C CLI: feature-space token MAE (reference: src/mae/train_mae.py).

Epoch-scheduled mask ratio, cosine LR with warmup, grad accumulation,
non-finite-skip, collapse detection, FULL resume (params/opt/step/epoch with
cfg-hash check), keep-last-N checkpoint GC, every-N-epoch reconstruction
visualizations.

The reference's own train_mae.py crashes on construction (SURVEY.md §2.10.1-3);
this implements the intended behavior per its sanity_check_mae.py contract.
"""
from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp

from ..data.masking import get_mask_ratio
from ..models import TinyViTMAE, tiny_vit_21m_variant
from ..train.mae_engine import make_token_mae_step, wrap_accum_and_skip
from ..train.state import TrainState, create_train_state, make_optimizer, warmup_cosine_schedule
from ..utils.checkpoint import (
    save_checkpoint, restore_checkpoint, keep_last_n_checkpoints, find_latest_checkpoint,
)
from ..utils.config import save_config
from ..utils.io import ensure_dir
from ..utils.metrics import update_best, format_metrics
from ..utils.prng import set_seed
from . import common


def build_model(cfg: dict, dtype, decoder_attn_impl: str | None = None) -> TinyViTMAE:
    mae = cfg["mae"]
    dec = mae.get("decoder", {})
    encoder = tiny_vit_21m_variant(use_checkpoint=bool(cfg.get("model", {}).get(
        "use_checkpoint", True)), dtype=dtype)
    return TinyViTMAE(
        encoder=encoder,
        stage4_pool=int(mae.get("stage4_pool", 3)),
        decoder_dim=int(dec.get("dim", 512)),
        decoder_depth=int(dec.get("depth", 2)),
        decoder_num_heads=int(dec.get("num_heads", 8)),
        mlp_ratio=float(dec.get("mlp_ratio", 4.0)),
        dtype=dtype,
        attn_impl=decoder_attn_impl,
    )


def run(cfg: dict, log=print, max_steps: int | None = None, resume: bool = True) -> dict:
    seed = int(cfg.get("seed", 42))
    root_key = set_seed(seed)
    dtype = common.compute_dtype_from(cfg)

    ds = common.dataset_from_cfg(cfg, common.split_path(cfg, cfg["dataset"]["train_split"]),
                                 "ssl", seed=seed)
    tr = cfg["training"]
    mae = cfg["mae"]
    B = int(tr["batch_size"])
    T, S = ds.clip_len, ds.image_size
    P = int(mae.get("stage4_pool", 3)) ** 2
    steps_per_epoch = max(1, len(ds) // B)
    epochs = int(tr["epochs"])

    out_dir = cfg.get("output", {}).get("dir", "results/mae")
    ensure_dir(out_dir)
    cfg_hash = save_config(cfg, os.path.join(out_dir, "config.json"))
    log(f"[INFO] train_mae: cfg_hash={cfg_hash} dtype={dtype.__name__}")

    # Parallel runtime BEFORE model build: sequence_parallel selects the
    # decoder's "sp" attention impl (same knobs as train_ssl_mae).
    mesh, batch_sharding, place_state, sp_on = common.setup_parallelism(cfg, B, log)[:4]
    ds = common.maybe_device_resident(cfg, ds, log, sharding=batch_sharding)
    model = build_model(cfg, dtype, decoder_attn_impl="sp" if sp_on else None)
    clip0 = jnp.zeros((B, T, S, S, 3), jnp.float32)
    mask0 = jnp.zeros((B, T * P), bool)
    # step RNG is fold_in(base, global_step) — NOT a sequentially split
    # stream — so a resumed run replays the identical mask stream an
    # uninterrupted run would have used (exact-resume invariant, tested by
    # tests/test_resume.py).
    init_key, step_key_base = jax.random.split(root_key)
    variables = jax.jit(lambda k: model.init(k, clip0, mask0))(init_key)

    sched = warmup_cosine_schedule(
        float(tr.get("lr", 3e-4)), int(tr.get("warmup_epochs", 0)) * steps_per_epoch,
        epochs * steps_per_epoch, float(tr.get("min_lr", 0.0)))
    betas = tuple(tr.get("betas", (0.9, 0.95)))
    tx = make_optimizer(sched, weight_decay=float(tr.get("weight_decay", 0.05)),
                        grad_clip=float(tr.get("clip_grad_norm", 1.0)), betas=betas)
    tx = wrap_accum_and_skip(tx, accum_steps=int(tr.get("grad_accum", 1)))
    state = create_train_state(variables["params"], tx,
                               batch_stats=variables.get("batch_stats"))

    loss_cfg = mae.get("loss", {})
    step_fn = make_token_mae_step(
        model, tx, tokens_per_frame=P, mask_mode=str(mae.get("mask_mode", "tube")),
        loss_type=str(loss_cfg.get("type", "l2")),
        normalize_target=bool(loss_cfg.get("normalize_target", True)),
        augment_hflip=bool(cfg.get("dataset", {}).get("augment", False)),
        compute_dtype=dtype)

    start_epoch, best = 1, None
    if resume:
        latest = find_latest_checkpoint(out_dir)
        if latest:
            # FULL resume (ref: src/mae/utils.py:73-92 checkpoints
            # model+optimizer+scheduler): opt_state carries the Adam moments
            # AND the warmup-cosine schedule's step count, so the LR continues
            # exactly where the interrupted run stopped.
            import json
            meta = {}
            if os.path.exists(latest + ".meta.json"):
                with open(latest + ".meta.json") as f:
                    meta = json.load(f)
            if meta.get("has_opt_state"):
                tmpl = {"step": 0, "params": variables["params"],
                        "opt_state": tx.init(variables["params"])}
                if variables.get("batch_stats") is not None:
                    tmpl["batch_stats"] = variables["batch_stats"]
                blob = restore_checkpoint(latest, target=tmpl)
                opt_state = blob["opt_state"]
            else:
                blob = restore_checkpoint(latest)
                opt_state = tx.init(blob["params"])
                log("[WARN] legacy checkpoint without opt_state; optimizer "
                    "moments and LR schedule restart from zero")
            if blob.get("cfg_hash") not in (None, cfg_hash):
                log(f"[WARN] resume cfg_hash mismatch ({blob.get('cfg_hash')} != {cfg_hash})")
            state = TrainState(
                step=jnp.asarray(blob["step"], jnp.int32),
                params=blob["params"], batch_stats=blob.get("batch_stats"),
                opt_state=opt_state, ema_params=None)
            start_epoch = int(blob["epoch"]) + 1
            best = blob.get("best")
            log(f"[INFO] resumed from {latest} at epoch {start_epoch}")

    # Placement after resume so the restored state is placed/sharded too.
    state = place_state(state)

    log_interval = int(tr.get("log_interval", 20))
    save_every = int(tr.get("save_every", 5))
    keep_last = int(tr.get("keep_last", 5))
    vis_every = int(mae.get("vis_every", 0))
    # Segment cap: exit cleanly (with a checkpoint) after N epochs so a
    # wrapper can run the job as a chain of fresh processes. Motivation: the
    # axon tunnel client leaks host RSS per transferred byte unconditionally
    # (scripts/probe_ingest_rss.py) — for >HBM splits the leak is bounded
    # only by process lifetime. See experiments/run_segmented.sh.
    max_epochs_per_run = tr.get("max_epochs_per_run")

    global_step = int(state.step)
    for epoch in range(start_epoch, epochs + 1):
        ratio = get_mask_ratio(epoch, mae.get("mask_ratio_schedule"),
                               float(mae.get("mask_ratio", 0.8)))
        t_ep = time.perf_counter()
        data_t, iter_t = 0.0, 0.0
        t_last = time.perf_counter()
        metrics = None
        epoch_metrics: dict = {}
        for step, batch in enumerate(
                common.epoch_batches(ds, B, shuffle=True, seed=seed, epoch=epoch,
                                     sharding=batch_sharding), 1):
            data_t += time.perf_counter() - t_last
            k = jax.random.fold_in(step_key_base, global_step)
            state, metrics = step_fn(state, batch, k, jnp.float32(ratio))
            global_step += 1
            iter_t += time.perf_counter() - t_last
            t_last = time.perf_counter()
            if step % log_interval == 0:
                m = {k2: float(v) for k2, v in metrics.items()}
                log(f"[INFO] ep={epoch} step={step}/{steps_per_epoch} ratio={ratio:.2f} "
                    + format_metrics(m)
                    + f" data_t={data_t:.1f}s iter_t={iter_t:.1f}s")
                if m["collapse"] > 0:
                    log("[WARN:pred_std_low] possible representation collapse")
            if max_steps is not None and global_step >= max_steps:
                break
        if metrics is not None:
            epoch_metrics = {k2: float(v) for k2, v in metrics.items()}
            best, improved = update_best(best, {"epoch": epoch, **epoch_metrics},
                                         key="loss", mode="min")
        log(f"[INFO] epoch {epoch} done in {time.perf_counter() - t_ep:.1f}s "
            + format_metrics(epoch_metrics))

        hit_segment_cap = (max_epochs_per_run is not None
                           and epoch - start_epoch + 1 >= int(max_epochs_per_run)
                           and epoch < epochs)
        if epoch % save_every == 0 or epoch == epochs or hit_segment_cap:
            save_checkpoint(out_dir, f"ckpt_epoch_{epoch}", {
                "step": int(state.step),
                "params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state,
            }, meta={"epoch": epoch, "cfg_hash": cfg_hash, "best": best,
                     "has_opt_state": True})
            deleted = keep_last_n_checkpoints(out_dir, keep_last)
            log(f"[INFO] saved ckpt_epoch_{epoch} (gc: {len(deleted)} old)")
        if vis_every and epoch % vis_every == 0:
            try:
                from ..reporting.visualize import save_mae_vis
                save_mae_vis(model, state, ds, out_dir, epoch, P,
                             ratio, str(mae.get("mask_mode", "tube")), dtype)
            except Exception as e:  # vis must never kill training
                log(f"[WARN] vis failed: {type(e).__name__}: {e}")
        if hit_segment_cap:
            log(f"[INFO] segment cap ({max_epochs_per_run} epochs/run) hit at "
                f"epoch {epoch}/{epochs}; exiting — relaunch to resume")
            return {"best": best, "steps": global_step, "completed": False,
                    "stopped_at_epoch": epoch}
        if max_steps is not None and global_step >= max_steps:
            break

    return {"best": best, "steps": global_step, "completed": True}


def main():
    p = common.make_parser("Feature-space token MAE (pipeline C)")
    p.add_argument("--cfg", type=str, default=None, help="alias for --config")
    p.add_argument("--no-resume", action="store_true")
    args = p.parse_args()
    if args.cfg and not args.config:
        args.config = args.cfg
    cfg = common.load_merged_config(args, "configs/mae_train.yaml")
    logger = common.make_logger(cfg, "train_mae")
    run(cfg, log=logger.log, resume=not args.no_resume)


if __name__ == "__main__":
    main()
