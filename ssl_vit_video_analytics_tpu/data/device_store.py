"""Device-resident clip store: the whole split lives in HBM, batches are
on-device gathers.

Two reasons to exist:
1. TPU-native: for corpora that fit in HBM (a 3k-clip 112x112 T=16 uint8
   split is ~1.8 GB vs 16 GB HBM on v5e) the per-step host->device batch
   transfer is pure overhead — one upload, then every batch is a ~20 us
   HBM gather fused ahead of the train step.
2. The axon tunnel's transfer path pins a host staging copy per device_put
   (~batch_size bytes leaked per step, measured: a 9.6 MB uint8 batch leaks
   9.2 MB/step; a multi-hour campaign OOM-killed the 128 GB host). With the
   store, the only recurring transfer is the [B] int32 index vector.

Batch composition (epoch order, tail padding, valid masks) reuses
loader.iter_batch_indices, so batches are bit-identical to the host path —
``get_clip`` is deterministic per (seed, index), so materializing the split
up front is exact, not an approximation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .loader import ClipDataset, _epoch_order, iter_batch_indices


class DeviceClipStore:
    """Materialized split on device. Duck-types the bits of ClipDataset the
    entry points use (len, mode) and provides epoch_batches."""

    def __init__(self, dataset: ClipDataset, sharding=None, log=print):
        n = len(dataset)
        self.mode = dataset.mode
        self.clip_len = dataset.clip_len
        self.image_size = dataset.image_size
        clips = np.stack([dataset.get_clip(i) for i in range(n)])
        # replicate across the mesh when a batch sharding is in play so the
        # gather's input is available everywhere; else default device
        if sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            mesh = (sharding.get("clip") if isinstance(sharding, dict)
                    else sharding).mesh
            place = NamedSharding(mesh, P())
        else:
            place = None
        self.clips = (jax.device_put(clips, place) if place is not None
                      else jax.device_put(clips))
        self.labels = None
        if dataset.mode != "ssl":
            self.labels = jnp.asarray(
                np.array([dataset.label(i) for i in range(n)], np.int32))
        log(f"[INFO] device-resident store: {n} clips "
            f"({clips.nbytes / 1e9:.2f} GB) uploaded once")
        self._gather_cache: dict = {}

    def __len__(self) -> int:
        return len(self.clips)

    def _gather(self, sharding):
        key = id(sharding)
        if key not in self._gather_cache:
            clip_sh = (sharding.get("clip") if isinstance(sharding, dict)
                       else sharding)
            kwargs = {}
            if clip_sh is not None:
                kwargs["out_shardings"] = clip_sh
            self._gather_cache[key] = jax.jit(
                lambda clips, idx: jnp.take(clips, idx, axis=0), **kwargs)
        return self._gather_cache[key]

    def epoch_batches(self, batch_size: int, *, shuffle: bool, seed: int,
                      epoch: int, drop_last: bool = True, sharding=None):
        gather = self._gather(sharding)
        for idxs_full, valid in iter_batch_indices(
                len(self), batch_size, shuffle=shuffle, seed=seed,
                epoch=epoch, drop_last=drop_last):
            idx_dev = jnp.asarray(idxs_full.astype(np.int32))
            batch = {"clip": gather(self.clips, idx_dev),
                     "valid": jnp.asarray(valid)}
            if self.labels is not None:
                batch["label"] = jnp.take(self.labels, idx_dev, axis=0)
            yield batch


class ChunkedDeviceClipStore:
    """Rotating device-resident shards for splits LARGER than the HBM budget
    (VERDICT r3 #3 — DeviceClipStore is all-or-nothing; bigger splits fell
    back to the leaking per-step host path).

    Exactness: shards are re-assembled from the host store every epoch, so
    the epoch's GLOBAL permutation can be the host path's own
    ``_epoch_order(n, shuffle, seed, epoch)``, cut into contiguous chunks of
    ``clips_per_shard`` (a multiple of the batch size, so batches never span
    shards and every gather compiles once). Batch order, composition, tail
    padding and valid masks are therefore BIT-IDENTICAL to
    ``iter_batch_indices`` / the host path (tests/test_device_store.py).

    Pipelining: while shard k trains, shard k+1 is assembled on a background
    thread and its (async) upload dispatched — host assembly (~800 clips/s
    warm) stays hidden behind device compute (~70 clips/s). Evicted shards
    are explicitly ``.delete()``d, which bounds DEVICE memory at ~2 resident
    shards. Measured caveat (scripts/probe_ingest_rss.py, round 4): under
    the axon tunnel, ``.delete()`` does NOT release the tunnel client's
    host staging copy — the client leaks per transferred byte on every
    path, so host RSS still grows ~1x shard bytes per rotation (303 MB
    leaked per 308 MB-transfer epoch). On a real TPU host there is no such
    leak. For multi-hour >HBM runs under axon, segment the run into fresh
    processes via exact checkpoint-resume (experiments/run_segmented.sh);
    the win that remains here regardless is bounded HBM + on-device
    per-step gathers + upload hidden behind compute.

    The recurring host->device traffic is one shard per rotation instead of
    one batch per step; the per-step path stays on-device gathers like
    DeviceClipStore.
    """

    def __init__(self, dataset: ClipDataset, shard_bytes: float,
                 batch_size: int, sharding=None, log=print):
        self.ds = dataset
        self.mode = dataset.mode
        self.clip_len = dataset.clip_len
        self.image_size = dataset.image_size
        n = len(dataset)
        clip_bytes = dataset.clip_len * dataset.image_size ** 2 * 3
        per = max(int(shard_bytes) // clip_bytes, batch_size)
        per -= per % batch_size  # batches never span shards
        self.clips_per_shard = min(per, n)
        self.batch_size = batch_size
        self.n = n
        self.num_shards = (n + self.clips_per_shard - 1) // self.clips_per_shard
        if sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            mesh = (sharding.get("clip") if isinstance(sharding, dict)
                    else sharding).mesh
            self._place = NamedSharding(mesh, P())
        else:
            self._place = None
        self.labels = None
        if dataset.mode != "ssl":
            self.labels = jnp.asarray(
                np.array([dataset.label(i) for i in range(n)], np.int32))
        log(f"[INFO] chunked device store: {n} clips in {self.num_shards} "
            f"shards of <= {self.clips_per_shard} "
            f"({self.clips_per_shard * clip_bytes / 1e9:.2f} GB resident x2)")
        self._gather = jax.jit(lambda clips, idx: jnp.take(clips, idx, axis=0))

    def __len__(self) -> int:
        return self.n

    def _upload(self, global_idxs: np.ndarray):
        """Assemble one shard on host and dispatch the (async) upload."""
        host = np.stack([self.ds.get_clip(int(i)) for i in global_idxs])
        return (jax.device_put(host, self._place) if self._place is not None
                else jax.device_put(host))

    def epoch_batches(self, batch_size: int, *, shuffle: bool, seed: int,
                      epoch: int, drop_last: bool = True, sharding=None):
        import concurrent.futures as cf

        assert batch_size == self.batch_size, \
            "ChunkedDeviceClipStore is sized for one batch size"
        C = self.clips_per_shard
        order = _epoch_order(self.n, shuffle, seed, epoch)
        shards = [order[lo:lo + C] for lo in range(0, self.n, C)]

        pool = cf.ThreadPoolExecutor(max_workers=1)
        try:
            nxt = pool.submit(self._upload, shards[0])
            for si, shard in enumerate(shards):
                arr = nxt.result()
                if si + 1 < len(shards):
                    nxt = pool.submit(self._upload, shards[si + 1])
                for lo in range(0, len(shard), batch_size):
                    sel = shard[lo:lo + batch_size]  # global indices
                    local = np.arange(lo, lo + len(sel))
                    if len(sel) < batch_size:  # global tail (last shard only)
                        if drop_last:
                            break
                        # identical to iter_batch_indices: pad with the last
                        # index, mask the pads out
                        n_real = len(sel)
                        local = np.concatenate(
                            [local, np.full(batch_size - n_real, local[-1])])
                        sel = np.concatenate(
                            [sel, np.full(batch_size - n_real, sel[-1])])
                        valid = np.zeros(batch_size, bool)
                        valid[:n_real] = True
                    else:
                        valid = np.ones(batch_size, bool)
                    batch = {"clip": self._gather(
                        arr, jnp.asarray(local.astype(np.int32))),
                        "valid": jnp.asarray(valid)}
                    if self.labels is not None:
                        batch["label"] = jnp.take(
                            self.labels, jnp.asarray(sel.astype(np.int32)), axis=0)
                    yield batch
                # evict: free HBM AND the tunnel client's pinned host staging
                arr.delete()
        finally:
            pool.shutdown(wait=False)
