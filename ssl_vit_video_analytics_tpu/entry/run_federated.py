"""Federated FedAvg CLI (reference: src/run_federated.py).

Pipeline: centralized same-budget baseline -> non-IID class-shard client
splits (+ stats CSV) -> FedAvg rounds -> fed_summary.csv +
system_privacy_summary.csv (raw-upload counterfactual vs FL comm).

TPU-native: all selected clients train SIMULTANEOUSLY — per-client params
and per-client batch streams are stacked on a leading axis sharded over the
mesh's ``client`` axis, and aggregation is a weighted cross-client reduce
(ICI all-reduce). The reference trains clients one-by-one on a single
device (ref: src/run_federated.py:270-303, src/federated/fed_loop.py:99-116).
CSV headers and float formats match the reference (ref: :325-363).
"""
from __future__ import annotations

import math
import os

import jax
import numpy as np

from ..data.splits import make_class_shard_splits
from ..federated import (
    make_parallel_client_update, run_fedavg, estimate_comm_mb_per_round,
    estimate_raw_upload_mb,
)
from ..ops.preprocess import normalize_clip
from ..parallel.mesh import make_mesh
from ..train import finetune_engine as eng
from ..train.state import create_train_state, make_optimizer
from ..utils.checkpoint import restore_checkpoint
from ..utils.io import write_csv, ensure_dir
from ..utils.prng import set_seed
from . import common

# CSV headers, byte-compatible with the reference outputs
# (ref: src/run_federated.py:343-349, :361-363; src/train_centralized :172-180)
FED_SUMMARY_FIELDS = ("round", "val_top1", "val_top5", "avg_local_loss",
                      "clients", "model_mb", "comm_mb_round", "comm_mb_total")
CENTRALIZED_FIELDS = ("epoch", "train_loss", "val_top1", "val_top5")
SYSTEM_PRIVACY_FIELDS = ("raw_upload_mb_est", "fed_comm_total_mb", "reduction_ratio")


def _build_round_sampler(client_datasets, batch_size: int, local_epochs: int,
                         clip_shape, seed: int):
    """Returns sample_round_batches(selected, round) -> (batches dict, sizes).

    Stacks per-client batch streams [N, S, B, ...] padded to the longest
    client (ragged tails masked via 'valid') — the stacked axis is what gets
    sharded over the mesh client axis.
    """
    T, S_img = clip_shape

    def sample(selected: list[int], rnd: int):
        per_client = []
        sizes = []
        for cid in selected:
            ds = client_datasets[cid]
            n = len(ds)
            sizes.append(float(n))
            order = []
            rng = np.random.default_rng(seed + 1000 * rnd + cid)
            for _ in range(local_epochs):
                order.extend(rng.permutation(n).tolist())
            steps = max(1, math.ceil(len(order) / batch_size))
            clips = np.zeros((steps, batch_size, T, S_img, S_img, 3), np.uint8)
            labels = np.zeros((steps, batch_size), np.int32)
            valid = np.zeros((steps, batch_size), bool)
            for s in range(steps):
                chunk = order[s * batch_size:(s + 1) * batch_size]
                for j, idx in enumerate(chunk):
                    clips[s, j] = ds.get_clip(int(idx))
                    labels[s, j] = ds.label(int(idx))
                    valid[s, j] = True
            per_client.append((clips, labels, valid))
        S_max = max(pc[0].shape[0] for pc in per_client)
        Nc = len(selected)
        clips = np.zeros((Nc, S_max, batch_size, T, S_img, S_img, 3), np.uint8)
        labels = np.zeros((Nc, S_max, batch_size), np.int32)
        valid = np.zeros((Nc, S_max, batch_size), bool)
        for i, (c, l, v) in enumerate(per_client):
            clips[i, :c.shape[0]] = c
            labels[i, :l.shape[0]] = l
            valid[i, :v.shape[0]] = v
        return ({"clip": clips, "label": labels, "valid": valid},
                np.asarray(sizes, np.float32))

    return sample


def _centralized_baseline(cfg: dict, train_split: str, val_ds, out_dir: str, log):
    c_cfg = cfg.get("centralized", {})
    if not bool(c_cfg.get("enabled", True)):
        return None
    fed = cfg["federated"]
    epochs = int(c_cfg.get("epochs") or int(fed["rounds"]) * int(fed["local_epochs"]))
    tr_cfg = {
        "learning_rate": float(c_cfg.get("lr", fed["lr"])),
        "weight_decay": float(c_cfg.get("weight_decay", fed["weight_decay"])),
        "grad_clip": None,  # reference client_sim.py does not clip
    }
    dtype = common.compute_dtype_from(cfg)
    seed = int(cfg.get("seed", 42))
    train_ds = common.dataset_from_cfg(cfg, train_split, "supervised", seed=seed + 123)
    B = int(c_cfg.get("batch_size", fed["batch_size"]))
    num_classes = int(cfg["dataset"]["num_classes"])
    model = eng.build_model(num_classes, int(cfg["model"]["embed_dim"]), dtype=dtype,
                            backbone=str(cfg["model"].get("backbone", "mobilevit_s")))
    variables = eng.init_model(model, jax.random.key(seed),
                               (B, train_ds.clip_len, train_ds.image_size,
                                train_ds.image_size, 3))
    tx = eng.build_finetune_tx(tr_cfg, "ft_random", variables["params"], False)
    state = create_train_state(variables["params"], tx,
                               batch_stats=variables.get("batch_stats"))
    train_step = eng.make_train_step(model, tx, compute_dtype=dtype, seed=seed)
    eval_step = eng.make_eval_step(model, compute_dtype=dtype)

    rows = []
    for ep in range(1, int(epochs) + 1):
        loss_sum, n_seen = 0.0, 0
        for batch in common.epoch_batches(train_ds, B, shuffle=True, seed=seed + 123, epoch=ep):
            state, metrics = train_step(state, batch)
            loss_sum += float(metrics["loss"]) * B
            n_seen += B
        acc = eng.evaluate(eval_step, state,
                           common.epoch_batches(val_ds, B, shuffle=False, seed=0,
                                                epoch=0, drop_last=False))
        avg_loss = loss_sum / max(1, n_seen)
        log(f"[INFO][Centralized] ep={ep}/{epochs} train_loss={avg_loss:.4f} "
            f"val_top1={acc['top1']:.4f} val_top5={acc['top5']:.4f}")
        rows.append({"epoch": ep, "train_loss": round(avg_loss, 6),
                     "val_top1": round(acc["top1"], 6), "val_top5": round(acc["top5"], 6)})
    out_csv = os.path.join(out_dir, "centralized_summary.csv")
    write_csv(out_csv, rows, fieldnames=list(CENTRALIZED_FIELDS))
    log(f"[INFO] Saved centralized summary: {out_csv}")
    return rows


def run(cfg: dict, log=print) -> dict:
    seed = int(cfg.get("seed", 42))
    set_seed(seed)
    dtype = common.compute_dtype_from(cfg)
    fed = cfg["federated"]
    out_dir = cfg.get("output", {}).get("save_dir", "results/privacy/federated")
    ensure_dir(out_dir)

    d = cfg["dataset"]
    train_split = common.split_path(cfg, d["train_split"])
    val_ds = common.dataset_from_cfg(cfg, common.split_path(cfg, d["val_split"]),
                                     "supervised", seed=seed + 999)

    # centralized same-budget baseline
    _centralized_baseline(cfg, train_split, val_ds, out_dir, log)

    # non-IID class-shard client splits + stats CSV
    non_iid = fed.get("non_iid", {})
    num_clients = int(fed["num_clients"])
    split_dir = cfg.get("paths", {}).get("split_root", "data/splits")
    paths, stats = make_class_shard_splits(
        train_split, num_clients,
        shards_per_client=int(non_iid.get("shards_per_client", 6)),
        seed=seed,
        min_samples_per_client=int(non_iid.get("min_samples_per_client", 200)),
        out_prefix=str(cfg.get("output", {}).get("split_prefix", "fed")),
        out_dir=split_dir)
    write_csv(os.path.join(out_dir, "fed_client_stats.csv"), stats)
    log(f"[INFO] client splits: {[s['num_samples'] for s in stats]}")

    client_datasets = [
        common.dataset_from_cfg(cfg, p, "supervised", seed=seed + i)
        for i, p in enumerate(paths)
    ]

    # global model
    B = int(fed["batch_size"])
    num_classes = int(d["num_classes"])
    model = eng.build_model(num_classes, int(cfg["model"]["embed_dim"]), dtype=dtype,
                            backbone=str(cfg["model"].get("backbone", "mobilevit_s")))
    clip_shape = (B, val_ds.clip_len, val_ds.image_size, val_ds.image_size, 3)
    variables = eng.init_model(model, jax.random.key(seed), clip_shape)
    init_ckpt = cfg["model"].get("init_ckpt")
    if init_ckpt and os.path.exists(init_ckpt):
        blob = restore_checkpoint(init_ckpt)
        variables = {"params": blob["params"], "batch_stats": blob.get("batch_stats")}
        log(f"[INFO] warm start from {init_ckpt}")

    # mesh over ALL devices: clients ride the 'client' axis; any selection
    # size works because run_fedavg_round pads with zero-weight dummy clients
    n_dev = jax.device_count()
    mesh = make_mesh({"client": n_dev}) if n_dev > 1 else None
    log(f"[INFO] mesh: {mesh} (clients={num_clients}, devices={n_dev})")

    step_chunk = fed.get("step_chunk")  # None = auto-size to ~1 GiB of clips
    parallel_update = make_parallel_client_update(
        model, lr=float(fed["lr"]), weight_decay=float(fed["weight_decay"]),
        normalize_fn=lambda c: normalize_clip(c, dtype=dtype), mesh=mesh,
        step_chunk=int(step_chunk) if step_chunk else None)

    eval_step = eng.make_eval_step(model, compute_dtype=dtype)

    def evaluate_fn(params, batch_stats):
        state = create_train_state(params, make_optimizer(1e-3), batch_stats=batch_stats)
        acc = eng.evaluate(eval_step, state,
                           common.epoch_batches(val_ds, B, shuffle=False, seed=0,
                                                epoch=0, drop_last=False))
        return acc["top1"], acc["top5"]

    sampler = _build_round_sampler(
        client_datasets, B, int(fed["local_epochs"]),
        (val_ds.clip_len, val_ds.image_size), seed)

    records, final_params, final_bs = run_fedavg(
        parallel_update, variables["params"], variables.get("batch_stats"),
        sampler, evaluate_fn, num_clients,
        rounds=int(fed["rounds"]),
        client_fraction=float(fed.get("client_fraction", 1.0)),
        mesh=mesh, log=log)

    # fed_summary.csv with cumulative comm
    comm_total = 0.0
    rows = []
    for r in records:
        comm_total += float(r["comm_mb_round"])
        rows.append({
            "round": r["round"],
            "val_top1": round(float(r["val_top1"]), 6),
            "val_top5": round(float(r["val_top5"]), 6),
            "avg_local_loss": round(float(r["avg_local_loss"]), 6),
            "clients": int(r["clients"]),
            "model_mb": round(float(r["model_mb"]), 6),
            "comm_mb_round": round(float(r["comm_mb_round"]), 6),
            "comm_mb_total": round(float(comm_total), 6),
        })
    fed_csv = os.path.join(out_dir, "fed_summary.csv")
    write_csv(fed_csv, rows, fieldnames=list(FED_SUMMARY_FIELDS))
    log(f"[INFO] Saved federated summary: {fed_csv}")

    # system-level privacy proxy
    sp = cfg.get("system_privacy", {})
    raw_mb = None
    if bool(sp.get("estimate_raw_upload", True)):
        n_samples = sum(1 for line in open(train_split) if line.strip())
        raw_mb = estimate_raw_upload_mb(
            n_samples, val_ds.clip_len, val_ds.image_size,
            bytes_per_value=int(sp.get("raw_dtype_bytes", 1)))
    sys_rows = [{
        "raw_upload_mb_est": round(raw_mb, 6) if raw_mb is not None else "",
        "fed_comm_total_mb": round(comm_total, 6),
        "reduction_ratio": round(comm_total / raw_mb, 6) if raw_mb else "",
    }]
    sys_csv = os.path.join(out_dir, "system_privacy_summary.csv")
    write_csv(sys_csv, sys_rows, fieldnames=list(SYSTEM_PRIVACY_FIELDS))
    log(f"[INFO] Saved system privacy summary: {sys_csv}")
    return {"records": rows, "fed_csv": fed_csv}


def main():
    p = common.make_parser("Federated FedAvg over the mesh client axis")
    args = p.parse_args()
    cfg = common.load_merged_config(args, "configs/federated.yaml")
    logger = common.make_logger(cfg, "federated")
    run(cfg, log=logger.log)


if __name__ == "__main__":
    main()
