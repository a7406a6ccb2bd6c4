"""Dynamic-inference benchmark CLI (reference: src/run_dynamic.py).

Three modes over the val split, each producing a CSV with the reference's
exact headers and float formats (ref: src/run_dynamic.py:140-163,179-232,
259-324):

- early_exit:   threshold sweep, streaming confidence exit
- frame_gating: top-k motion/random frame selection + full forward
- hybrid:       gating(k) then early-exit(threshold), k x thr grid

Latency is host-measured wall time around a synced jitted call (the TPU
equivalent of the reference's CUDA-event timing, ref: :109-130), with the
same warmup/measure batch windows.
"""
from __future__ import annotations

import os
import time

import jax
import numpy as np

from ..models.dynamic import (early_exit_batched, select_topk_frames,
                              streaming_early_exit)
from ..train import finetune_engine as eng
from ..utils.checkpoint import restore_checkpoint
from ..utils.io import write_csv, ensure_dir
from ..utils.prng import set_seed
from . import common

# CSV headers, byte-compatible with the reference outputs
# (ref: src/run_dynamic.py:89,179,259 — literal header strings)
EARLY_EXIT_FIELDS = ("threshold", "top1", "top5", "avg_frames", "avg_conf",
                     "avg_latency_ms", "throughput_fps")
FRAME_GATING_FIELDS = ("k", "top1", "top5", "avg_latency_ms", "throughput_clips_per_s")
HYBRID_FIELDS = ("k", "threshold", "top1", "top5", "avg_used_frames", "avg_conf",
                 "avg_latency_ms")


def _load_classifier(cfg: dict, dtype, clip_shape, log):
    model = eng.build_model(int(cfg["dataset"]["num_classes"]),
                            int(cfg["model"]["embed_dim"]), dtype=dtype,
                            backbone=str(cfg["model"].get("backbone", "mobilevit_s")))
    variables = eng.init_model(model, jax.random.key(0), clip_shape)
    ckpt = cfg["model"].get("finetune_ckpt")
    if ckpt and os.path.exists(ckpt):
        blob = restore_checkpoint(ckpt)
        variables = {"params": blob["params"], "batch_stats": blob.get("batch_stats")}
        log(f"[INFO] loaded finetune ckpt: {ckpt}")
    else:
        log(f"[WARN] finetune ckpt not found ({ckpt}); random weights")
    return model, variables


def _topk_np(logits: np.ndarray, labels: np.ndarray, ks=(1, 5)):
    order = np.argsort(-logits, axis=1)
    out = {}
    for k in ks:
        out[k] = float(np.mean([labels[i] in order[i, :k] for i in range(len(labels))]))
    return out


def _valid_rows(arr: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Keep only real (non-padding) samples of a padded tail batch."""
    return arr[np.asarray(valid)]


def _measure_window(rt: dict, ds, batch_size: int) -> tuple[int, int]:
    """Warmup/measure batch window, clamped to the actual batch count.

    The first batch always pays compilation; with a small val split a fixed
    num_warmup could swallow every batch (measuring nothing) or, at 0, let
    compile time into the window (round-1 example CSVs showed an 84 s
    first-row latency). Guarantee: >= 1 warmup batch, >= 1 measured batch
    whenever two batches exist.
    """
    n_batches = -(-len(ds) // batch_size)
    warm = int(rt.get("num_warmup", 10))
    meas = int(rt.get("num_measure", 50))
    # every mode also pre-warms the compiled fn on the first batch before its
    # timed loop, so warm=0 (single-batch val split) still measures honestly
    warm = max(1, min(warm, n_batches - 1)) if n_batches > 1 else 0
    return warm, max(1, meas)


def _first_batch(ds, B):
    """One batch for pre-warming compiled fns outside the timed loops.

    Uses iterate_batches directly (NOT the prefetcher): abandoning a
    prefetch generator would strand its producer thread on a full queue.
    """
    from ..data.device_store import DeviceClipStore
    from ..data.loader import iterate_batches
    if isinstance(ds, DeviceClipStore):  # gathers have no producer thread
        return next(iter(ds.epoch_batches(
            B, shuffle=False, seed=0, epoch=0, drop_last=False)))
    return next(iter(iterate_batches(
        ds, B, shuffle=False, seed=0, epoch=0, drop_last=False)))


def _early_exit_fn(cfg, log):
    """Select the early-exit implementation.

    dynamic.early_exit_impl: streaming | batched | auto (default). Both
    produce identical top-k/used_frames/conf statistics (models/dynamic.py,
    equivalence-tested); they differ only in wall-clock. ``auto`` picks
    batched on TPU — one [B*M]-frame encode keeps the MXU busy (measured
    ~5x lower serving latency than the sequential per-frame loop) — and
    streaming elsewhere, where per-frame encodes can actually stop early.
    """
    impl = str(cfg.get("dynamic", {}).get("early_exit_impl", "auto")).lower()
    if impl == "auto":
        impl = "batched" if jax.default_backend() == "tpu" else "streaming"
    if impl not in ("streaming", "batched"):
        raise ValueError(f"[ERROR] Unknown early_exit_impl: {impl}")
    log(f"[INFO] early-exit impl: {impl}")
    return early_exit_batched if impl == "batched" else streaming_early_exit


def run_early_exit(cfg, model, variables, ds, log) -> list[dict]:
    dyn = cfg["dynamic"]
    rt = cfg["runtime"]
    B = int(rt["batch_size"])
    warm, meas = _measure_window(rt, ds, B)

    def embed_fn(frames):
        return model.apply(variables, frames, method="frame_embedding")

    def classify_fn(emb):
        return model.apply(variables, emb, method="classify_embedding")

    from ..ops.preprocess import normalize_clip
    import jax.numpy as jnp
    ee_fn = _early_exit_fn(cfg, log)
    # threshold is a TRACED argument: one compile serves the whole sweep
    # (the reference pays nothing per threshold; neither do we)
    fn_full = jax.jit(lambda raw, t: ee_fn(
        embed_fn, classify_fn, normalize_clip(raw), t,
        min_frames=int(dyn.get("min_frames", 4)),
        max_frames=dyn.get("max_frames"),
        frame_step=int(dyn.get("frame_step", 1))))
    wb = _first_batch(ds, B)
    np.asarray(fn_full(wb["clip"], jnp.float32(
        float(dyn["confidence_thresholds"][0])))[1].final_conf)  # compile+warm
    rows = []
    for thr in dyn["confidence_thresholds"]:
        logits_all, labels_all, used_all, conf_all = [], [], [], []
        times = []
        # drop_last=False + valid mask: the full val split contributes to
        # accuracy, like the reference's loader (ref: src/run_dynamic.py:102)
        for i, batch in enumerate(common.epoch_batches(
                ds, B, shuffle=False, seed=0, epoch=0, drop_last=False)):
            t0 = time.perf_counter()
            logits, stats = fn_full(batch["clip"], jnp.float32(thr))
            conf = np.asarray(stats.final_conf)  # forces sync
            dt = (time.perf_counter() - t0) * 1000.0
            if warm <= i < warm + meas:
                times.append(dt)
            v = np.asarray(batch["valid"])
            logits_all.append(_valid_rows(np.asarray(logits), v))
            labels_all.append(_valid_rows(np.asarray(batch["label"]), v))
            used_all.append(_valid_rows(np.asarray(stats.used_frames), v))
            conf_all.append(_valid_rows(conf, v))
        logits_np = np.concatenate(logits_all)
        labels_np = np.concatenate(labels_all)
        accs = _topk_np(logits_np, labels_np)
        avg_frames = float(np.mean(np.concatenate(used_all)))
        avg_latency = float(np.mean(times)) if times else 0.0
        # ref: src/run_dynamic.py:144-150 — effective frames/sec processed
        clips_per_sec = (B / (avg_latency / 1000.0)) if avg_latency > 0 else 0.0
        throughput_fps = clips_per_sec * avg_frames
        row = {
            "threshold": f"{float(thr):.2f}",
            "top1": f"{accs[1]:.6f}",
            "top5": f"{accs[5]:.6f}",
            "avg_frames": f"{avg_frames:.3f}",
            "avg_conf": f"{float(np.mean(np.concatenate(conf_all))):.4f}",
            "avg_latency_ms": f"{avg_latency:.3f}",
            "throughput_fps": f"{throughput_fps:.2f}",
        }
        rows.append(row)
        log(f"[INFO] early_exit thr={thr} top1={row['top1']} frames={row['avg_frames']} "
            f"lat={row['avg_latency_ms']}ms")
    return rows


def run_frame_gating(cfg, model, variables, ds, log) -> list[dict]:
    from ..ops.preprocess import normalize_clip
    dyn = cfg["dynamic"]
    rt = cfg["runtime"]
    B = int(rt["batch_size"])
    warm, meas = _measure_window(rt, ds, B)
    score = str(dyn.get("gating_score", "motion"))

    rows = []
    wb = _first_batch(ds, B)  # fetched once; reused for every k's warm call
    for k in dyn["gating_topk_list"]:
        k_eff = min(int(k), ds.clip_len)  # ref: src/run_dynamic.py:191
        def fn(raw, key, k=k_eff):
            clip = normalize_clip(raw)
            sel, _ = select_topk_frames(clip, k, score_type=score, key=key)
            return model.apply(variables, sel)
        jfn = jax.jit(fn)
        np.asarray(jfn(wb["clip"], jax.random.key(1)))  # compile+warm
        logits_all, labels_all, times = [], [], []
        key = jax.random.key(0)
        for i, batch in enumerate(common.epoch_batches(
                ds, B, shuffle=False, seed=0, epoch=0, drop_last=False)):
            key, sub = jax.random.split(key)
            t0 = time.perf_counter()
            logits = np.asarray(jfn(batch["clip"], sub))
            dt = (time.perf_counter() - t0) * 1000.0
            if warm <= i < warm + meas:
                times.append(dt)
            v = np.asarray(batch["valid"])
            logits_all.append(_valid_rows(logits, v))
            labels_all.append(_valid_rows(np.asarray(batch["label"]), v))
        accs = _topk_np(np.concatenate(logits_all), np.concatenate(labels_all))
        avg_latency = float(np.mean(times)) if times else 0.0
        # ref: src/run_dynamic.py:209-213
        clips_per_sec = (B / (avg_latency / 1000.0)) if avg_latency > 0 else 0.0
        row = {
            "k": str(k_eff),
            "top1": f"{accs[1]:.6f}",
            "top5": f"{accs[5]:.6f}",
            "avg_latency_ms": f"{avg_latency:.3f}",
            "throughput_clips_per_s": f"{clips_per_sec:.2f}",
        }
        rows.append(row)
        log(f"[INFO] frame_gating k={k_eff} score={score} top1={row['top1']} "
            f"lat={row['avg_latency_ms']}ms")
    return rows


def run_hybrid(cfg, model, variables, ds, log) -> list[dict]:
    from ..ops.preprocess import normalize_clip
    dyn = cfg["dynamic"]
    rt = cfg["runtime"]
    B = int(rt["batch_size"])
    warm, meas = _measure_window(rt, ds, B)
    score = str(dyn.get("gating_score", "motion"))

    def embed_fn(frames):
        return model.apply(variables, frames, method="frame_embedding")

    def classify_fn(emb):
        return model.apply(variables, emb, method="classify_embedding")

    import jax.numpy as jnp
    ee_fn = _early_exit_fn(cfg, log)
    rows = []
    wb = _first_batch(ds, B)  # fetched once; reused for every k's warm call
    for k in dyn["gating_topk_list"]:
        k_eff = min(int(k), ds.clip_len)  # ref: src/run_dynamic.py:274
        # k changes the gathered clip shape (one compile per k); the
        # threshold is traced (free sweep)
        def fn(raw, key, t, k=k_eff):
            clip = normalize_clip(raw)
            sel, _ = select_topk_frames(clip, k, score_type=score, key=key)
            return ee_fn(
                embed_fn, classify_fn, sel, t,
                min_frames=int(dyn.get("min_frames", 4)),
                max_frames=dyn.get("max_frames"),
                frame_step=int(dyn.get("frame_step", 1)))
        jfn = jax.jit(fn)
        np.asarray(jfn(wb["clip"], jax.random.key(1), jnp.float32(
            float(dyn["confidence_thresholds"][0])))[1].final_conf)  # compile+warm
        for thr in dyn["confidence_thresholds"]:
            logits_all, labels_all, used_all, conf_all, times = [], [], [], [], []
            key = jax.random.key(0)
            for i, batch in enumerate(common.epoch_batches(
                    ds, B, shuffle=False, seed=0, epoch=0, drop_last=False)):
                key, sub = jax.random.split(key)
                t0 = time.perf_counter()
                logits, stats = jfn(batch["clip"], sub, jnp.float32(thr))
                used = np.asarray(stats.used_frames)
                dt = (time.perf_counter() - t0) * 1000.0
                if warm <= i < warm + meas:
                    times.append(dt)
                v = np.asarray(batch["valid"])
                logits_all.append(_valid_rows(np.asarray(logits), v))
                labels_all.append(_valid_rows(np.asarray(batch["label"]), v))
                used_all.append(_valid_rows(used, v))
                conf_all.append(_valid_rows(np.asarray(stats.final_conf), v))
            accs = _topk_np(np.concatenate(logits_all), np.concatenate(labels_all))
            # ref: src/run_dynamic.py:309-316
            row = {
                "k": str(k_eff),
                "threshold": f"{float(thr):.2f}",
                "top1": f"{accs[1]:.6f}",
                "top5": f"{accs[5]:.6f}",
                "avg_used_frames": f"{float(np.mean(np.concatenate(used_all))):.3f}",
                "avg_conf": f"{float(np.mean(np.concatenate(conf_all))):.4f}",
                "avg_latency_ms": f"{float(np.mean(times)) if times else 0.0:.3f}",
            }
            rows.append(row)
            log(f"[INFO] hybrid k={k_eff} thr={thr} top1={row['top1']} "
                f"frames={row['avg_used_frames']} lat={row['avg_latency_ms']}ms")
    return rows


def run(cfg: dict, mode: str | None = None, log=print) -> dict:
    set_seed(int(cfg.get("seed", 42)))
    dtype = common.compute_dtype_from(cfg)
    mode = mode or cfg.get("dynamic", {}).get("mode", "early_exit")
    ds = common.dataset_from_cfg(cfg, common.split_path(cfg, cfg["dataset"]["split"]),
                                 "supervised")
    B = int(cfg["runtime"]["batch_size"])
    model, variables = _load_classifier(
        cfg, dtype, (B, ds.clip_len, ds.image_size, ds.image_size, 3), log)
    # serving sweeps re-iterate the split once per knob setting; HBM-resident
    # data makes each pass a pure on-device gather (dataset.device_resident)
    ds = common.maybe_device_resident(cfg, ds, log)

    save_dir = cfg.get("output", {}).get("save_dir", "results/dynamic")
    ensure_dir(save_dir)
    runners = {"early_exit": run_early_exit, "frame_gating": run_frame_gating,
               "hybrid": run_hybrid}
    if mode not in runners:
        raise ValueError(f"[ERROR] Unknown dynamic mode: {mode}")
    rows = runners[mode](cfg, model, variables, ds, log)
    out_csv = os.path.join(save_dir, f"{mode}_results.csv")
    if cfg.get("output", {}).get("save_csv", True):
        write_csv(out_csv, rows)
        log(f"[INFO] wrote {out_csv}")
    return {"rows": rows, "csv": out_csv}


def main():
    p = common.make_parser("Dynamic inference latency-accuracy frontier")
    p.add_argument("--mode", type=str, default=None,
                   help="early_exit | frame_gating | hybrid")
    args = p.parse_args()
    cfg = common.load_merged_config(args, "configs/dynamic.yaml")
    logger = common.make_logger(cfg, f"dynamic_{args.mode or 'cfg'}")
    run(cfg, mode=args.mode, log=logger.log)


if __name__ == "__main__":
    main()
