"""Shared runtime plumbing for the CLI entry points.

Each entry point mirrors a reference script (train_ssl / train_ssl_mae /
train_mae / train_finetune / run_dynamic / run_privacy / run_federated) with
the same --config/--base/--mode CLI shape (ref: src/train_finetune.py:214-218,
src/run_dynamic.py:328-343) plus ``--set key.path=value`` functional overrides
(replacing the reference ablation driver's rewrite-YAML-in-place trick,
ref: src/ablations.py:30-36).
"""
from __future__ import annotations

import argparse
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..data.loader import ClipDataset, iterate_batches, prefetch_to_device
from ..utils.config import load_config
from ..utils.io import Logger, ensure_dir


def make_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--config", type=str, required=False)
    p.add_argument("--base", type=str, default="configs/base.yaml")
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   help="config override: key.path=value (repeatable)")
    return p


def load_merged_config(args, default_config: str) -> dict:
    return load_config(args.config or default_config, base=args.base,
                       overrides=args.overrides)


def compute_dtype_from(cfg: dict):
    name = str(cfg.get("device", {}).get("compute_dtype", "bfloat16")).lower()
    if jax.default_backend() == "cpu" and name == "bfloat16":
        # CPU (tests / smoke): bf16 is emulated and slow; fp32 is exact
        return jnp.float32
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}.get(name, jnp.float32)


def dataset_from_cfg(cfg: dict, split_file: str, mode: str, seed: int | None = None) -> ClipDataset:
    d = cfg["dataset"]
    return ClipDataset(
        split_file=split_file,
        mode=mode,
        clip_len=int(d.get("clip_len", 16)),
        stride=int(d.get("stride", 2)),
        image_size=int(d.get("image_size", 112)),
        seed=int(seed if seed is not None else cfg.get("seed", 42)),
        backend=str(d.get("backend", "packed")),
    )


def split_path(cfg: dict, name: str) -> str:
    """Resolve a split name against paths.split_root unless already a path."""
    if os.path.sep in name or os.path.exists(name):
        return name
    return os.path.join(cfg.get("paths", {}).get("split_root", "data/splits"), name)


def epoch_batches(dataset, batch_size: int, shuffle: bool, seed: int,
                  epoch: int, prefetch: int = 2, drop_last: bool = True,
                  sharding=None):
    from ..data.device_store import ChunkedDeviceClipStore, DeviceClipStore

    if isinstance(dataset, (DeviceClipStore, ChunkedDeviceClipStore)):
        return dataset.epoch_batches(batch_size, shuffle=shuffle, seed=seed,
                                     epoch=epoch, drop_last=drop_last,
                                     sharding=sharding)
    it = iterate_batches(dataset, batch_size, shuffle=shuffle, seed=seed,
                         epoch=epoch, drop_last=drop_last)
    return prefetch_to_device(it, size=prefetch, sharding=sharding)


def maybe_device_resident(cfg: dict, dataset, log=print, sharding=None,
                          max_bytes: float = 4e9, batch_size: int | None = None):
    """Promote a ClipDataset to a device-resident store.

    dataset.device_resident: auto (default) | true | false | chunked.
      auto: TPU-backed packed splits up to ``max_bytes`` go fully resident
        (DeviceClipStore); LARGER splits rotate HBM shards
        (ChunkedDeviceClipStore) instead of falling back to the leaking
        per-step host path — see data/device_store.py docstrings.
      chunked: force shard rotation (dataset.resident_shard_bytes caps the
        resident shard size, default 2 GB; ~2 shards live at once).
    """
    if dataset is None:
        return None
    from ..data.device_store import ChunkedDeviceClipStore, DeviceClipStore

    d_cfg = cfg.get("dataset", {})
    want = d_cfg.get("device_resident", "auto")
    if want in (False, 0, "false", "off"):
        return dataset
    est = (len(dataset) * dataset.clip_len
           * dataset.image_size * dataset.image_size * 3)

    def chunked():
        B = batch_size or int(cfg.get("training", cfg.get("runtime", {}))
                              .get("batch_size", 8))
        shard_bytes = float(d_cfg.get("resident_shard_bytes", 2e9))
        return ChunkedDeviceClipStore(dataset, shard_bytes, B,
                                      sharding=sharding, log=log)

    if want == "chunked":
        return chunked()
    if want == "auto":
        if jax.default_backend() != "tpu":
            return dataset
        if est > max_bytes:
            return chunked()
    elif est > 12e9:
        log(f"[WARN] device_resident: split is {est / 1e9:.1f} GB; "
            "switching to chunked shard rotation")
        return chunked()
    return DeviceClipStore(dataset, sharding=sharding, log=log)


def setup_data_parallel(cfg: dict, batch_size: int, log=print):
    """Multi-chip data parallelism: batch sharded over a ``data`` mesh axis,
    params replicated; XLA inserts the gradient all-reduce.

    Returns (mesh | None, batch_sharding | None, place_state fn).
    Controlled by device.data_parallel: auto (default; on when >1 device) |
    false | N (use N devices).
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..parallel.mesh import make_mesh

    want = cfg.get("device", {}).get("data_parallel", "auto")
    n_dev = jax.device_count()
    if want in (False, 0, 1) or n_dev == 1:
        return None, None, lambda s: s
    n = n_dev if want == "auto" else min(int(want), n_dev)
    while n > 1 and batch_size % n != 0:
        n -= 1
    if n <= 1:
        log(f"[WARN] batch_size={batch_size} not divisible across {n_dev} devices; "
            "running single-device")
        return None, None, lambda s: s
    mesh = make_mesh({"data": n})
    repl = NamedSharding(mesh, P())
    dsh = NamedSharding(mesh, P("data"))
    log(f"[INFO] data-parallel over {n} devices: {mesh}")

    def place_state(state):
        return jax.device_put(state, repl)

    return mesh, dsh, place_state


class ParallelRuntime(NamedTuple):
    """What setup_parallelism resolved. ``pp_mesh``/``pp_microbatches`` are
    set only when pipeline parallelism is active (pipeline-B decoder)."""

    mesh: object
    batch_sharding: object
    place_state: object
    sp_on: bool
    pp_mesh: object = None
    pp_microbatches: int | None = None


def setup_parallelism(cfg: dict, batch_size: int, log=print,
                      allow_pp: bool = False) -> "ParallelRuntime":
    """Full parallel runtime for the pipeline-B/C training entries.

    User-reachable config knobs (SURVEY §5.7/§5.8):
      device.data_parallel:    auto (default) | false | N — batch over "data"
      device.model_parallel:   N — Megatron TP (parallel/tp.py) on a
                               dp x tp mesh; params AND optimizer moments
                               sharded column/row-parallel, XLA inserts the
                               all-reduces. Attention falls back to the XLA
                               einsum path (GSPMD partitions einsums; a
                               pallas_call cannot be partitioned).
      model.sequence_parallel: true — decoder attention sharded over a "seq"
                               axis (parallel/sp.py): clip sharded over T,
                               K/V all-gathered over ICI. The long-clip
                               regime; exclusive with model_parallel.
      device.pipeline_parallel: N — GPipe pipeline over the decoder's block
                               stack (parallel/pp.py): stages hold
                               decoder_depth/N blocks each, microbatches
                               stream via ICI ppermute. Pipeline-B only
                               (``allow_pp``); decoder_depth must divide by
                               N. device.pp_microbatches tunes the bubble
                               (default N).
      device.expert_parallel:  N — with model.decoder_moe_experts set (opt-in
                               MoE decoder MLPs, models/layers.MoeMlp), the
                               expert bank shards over an "expert" axis
                               (parallel/ep.py). Pipeline-B only; experts
                               must divide by N. Composes with
                               device.data_parallel (leftover devices form
                               a dp x ep mesh, batch sharded over "data");
                               exclusive with tp/sp/pp.

    Returns a ParallelRuntime (mesh, batch_sharding, place_state, sp_on,
    pp_mesh, pp_microbatches).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..parallel.mesh import make_mesh

    dev_cfg = cfg.get("device", {})
    n_dev = jax.device_count()
    sp_on = bool(cfg.get("model", {}).get("sequence_parallel", False)
                 or dev_cfg.get("sequence_parallel", False))
    tp = int(dev_cfg.get("model_parallel", 1) or 1)
    pp = int(dev_cfg.get("pipeline_parallel", 1) or 1)
    ep = int(dev_cfg.get("expert_parallel", 1) or 1)

    if ep > 1:
        moe = int(cfg.get("model", {}).get("decoder_moe_experts", 0) or 0)
        if not allow_pp:
            log("[WARN] device.expert_parallel is only supported by the "
                "pipeline-B entry (train_ssl_mae); ignoring")
        elif sp_on or tp > 1 or pp > 1:
            log("[WARN] expert_parallel is exclusive with the other "
                "model-sharding knobs; ignoring expert_parallel")
        elif moe <= 0:
            log("[WARN] expert_parallel needs model.decoder_moe_experts > 0; "
                "ignoring")
        elif n_dev < 2:
            log("[WARN] expert_parallel requested on 1 device; ignoring")
        else:
            from ..parallel.ep import (count_bank_sharded, set_ep_mesh,
                                       shard_state_ep)
            ep = min(ep, n_dev)
            while ep > 1 and moe % ep:
                ep -= 1
            # remaining devices become a data axis (dp x ep), honoring an
            # explicit device.data_parallel cap; batch shards over "data",
            # expert bank + expert FLOPs over "expert" (parallel/ep.py).
            # NOTE: `is True` not `in (True, ...)` — a user's explicit
            # data_parallel: 1 equals True in Python and must mean dp OFF.
            dp_req = dev_cfg.get("data_parallel", "auto")
            dp = (n_dev // ep if (dp_req == "auto" or dp_req is True
                                  or dp_req is None)
                  else int(dp_req or 1))
            dp = max(1, min(dp, n_dev // ep))
            while dp > 1 and batch_size % dp:
                dp -= 1
            mesh = make_mesh({"data": dp, "expert": ep},
                             devices=jax.devices()[: dp * ep])
            set_ep_mesh(mesh)
            repl = NamedSharding(mesh, P())
            batch_sharding = (NamedSharding(mesh, P("data")) if dp > 1
                              else repl)
            log(f"[INFO] expert-parallel MoE decoder: {moe} experts over "
                f"{ep} devices" + (f" x dp{dp}" if dp > 1 else "")
                + f": {mesh}")

            def place_state(state):
                # expert banks + their optimizer moments shard P("expert");
                # everything else replicates (parallel/ep.shard_state_ep)
                placed = shard_state_ep(state, mesh)
                n_sh, n_tot = count_bank_sharded(state.params, mesh)
                log(f"[INFO] EP: {n_sh}/{n_tot} param leaves (expert banks) "
                    f"sharded over 'expert'")
                return placed

            return ParallelRuntime(mesh, batch_sharding, place_state, False)

    if pp > 1:
        if not allow_pp:
            log("[WARN] device.pipeline_parallel is only supported by the "
                "pipeline-B entry (train_ssl_mae); ignoring")
        elif sp_on or tp > 1:
            log("[WARN] pipeline_parallel is exclusive with sequence_parallel"
                "/model_parallel; ignoring pipeline_parallel")
        elif n_dev < 2:
            log("[WARN] pipeline_parallel requested on 1 device; ignoring")
        else:
            pp = min(pp, n_dev)
            mesh = make_mesh({"pipe": pp}, devices=jax.devices()[:pp])
            repl = NamedSharding(mesh, P())
            n_micro = int(dev_cfg.get("pp_microbatches", pp) or pp)
            if batch_size % n_micro:
                raise ValueError(
                    f"batch_size={batch_size} not divisible by "
                    f"pp_microbatches={n_micro}")
            log(f"[INFO] pipeline-parallel decoder over {pp} stages, "
                f"{n_micro} microbatches: {mesh}")
            return ParallelRuntime(
                mesh, repl, (lambda s: jax.device_put(s, repl)), False,
                pp_mesh=mesh, pp_microbatches=n_micro)

    if sp_on:
        from ..ops import attention as attn_mod
        if n_dev == 1:
            log("[WARN] sequence_parallel requested on 1 device; attention "
                "falls back to the single-device kernel")
            attn_mod.set_sp_mesh(None)
            return ParallelRuntime(None, None, (lambda s: s), True)
        mesh = make_mesh({"seq": n_dev})
        attn_mod.set_sp_mesh(mesh, "seq")
        repl = NamedSharding(mesh, P())
        # clip sharded over T: the encoder's folded B*T frame batch and the
        # decoder's T*L token sequence inherit the shard; scalars replicate
        batch_sharding = {"clip": NamedSharding(mesh, P(None, "seq")), None: repl}
        log(f"[INFO] sequence-parallel over {n_dev} devices: {mesh}")
        return ParallelRuntime(mesh, batch_sharding,
                               (lambda s: jax.device_put(s, repl)), True)

    if tp > 1 and n_dev > 1:
        from ..ops.attention import set_default_impl
        from ..parallel.tp import count_sharded, shard_state_tp

        tp = min(tp, n_dev)
        while tp > 1 and n_dev % tp != 0:
            tp -= 1
        dp = n_dev // tp
        while dp > 1 and batch_size % dp != 0:
            dp -= 1
        mesh = make_mesh({"data": dp, "model": tp},
                         devices=jax.devices()[: dp * tp])
        set_default_impl("xla")  # GSPMD-partitionable attention under TP
        dsh = NamedSharding(mesh, P("data"))
        log(f"[INFO] dp{dp} x tp{tp} mesh: {mesh} (attention impl -> xla)")

        def place_state(state):
            placed = shard_state_tp(state, mesh)
            n_sh, n_tot = count_sharded(state.params, mesh)
            log(f"[INFO] TP: {n_sh}/{n_tot} param leaves sharded over 'model'")
            return placed

        return ParallelRuntime(mesh, dsh, place_state, False)

    mesh, dsh, place_state = setup_data_parallel(cfg, batch_size, log)
    return ParallelRuntime(mesh, dsh, place_state, False)


def make_logger(cfg: dict, name: str) -> Logger:
    log_dir = cfg.get("paths", {}).get("log_dir", "logs")
    ensure_dir(log_dir)
    return Logger(log_path=os.path.join(log_dir, f"{name}.log"))
