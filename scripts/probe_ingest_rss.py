"""Host-RSS probe for the >HBM ingest paths (VERDICT r3 #3).

The axon tunnel client pins a host staging copy per device_put for the life
of the device buffer (CLAUDE.md: ~1x transferred bytes leaked per step on
the per-batch host path — a multi-hour run OOMs the 128 GB host). The
chunked store's bet is that EXPLICITLY DELETING evicted shard buffers
releases that staging, so host RSS stays bounded by ~2 resident shards no
matter how many epochs stream through.

This probe measures exactly that, on the real chip:
  arm A (per-step host path): device_put one uint8 batch per step, train-free
    (pure transfer), report RSS growth per step.
  arm B (chunked rotation): ChunkedDeviceClipStore over a synthetic split
    with a small shard cap, several epochs, report RSS at each shard
    boundary + max growth after warmup.

Run: python scripts/probe_ingest_rss.py [--epochs 4] [--shard-mb 64]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import ssl_vit_video_analytics_tpu  # noqa: F401  (flips jax to CPU when JAX_PLATFORM_NAME=cpu — works offline)

import jax
import jax.numpy as jnp
import numpy as np


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for ln in f:
            if ln.startswith("VmRSS"):
                return int(ln.split()[1]) / 1024.0
    return -1.0


def arm_a(steps: int, batch_mb: float):
    """Per-step device_put, the leaking baseline."""
    B = max(1, int(batch_mb * 1e6) // (16 * 112 * 112 * 3))
    host = np.random.randint(0, 255, (B, 16, 112, 112, 3), np.uint8)
    print(f"[arm A] per-step host path: {steps} x {host.nbytes / 1e6:.1f} MB")
    r0 = rss_mb()
    consumed = None
    for i in range(steps):
        arr = jax.device_put(host)
        consumed = jnp.sum(arr[0, 0, 0, 0])  # force materialization
        float(consumed)
        if i % 10 == 0:
            print(f"  step {i:3d} rss={rss_mb():8.1f} MB (+{rss_mb() - r0:7.1f})",
                  flush=True)
    growth = rss_mb() - r0
    print(f"[arm A] growth {growth:.1f} MB over {steps} steps "
          f"({growth / steps:.2f} MB/step vs {host.nbytes / 1e6:.1f} MB/batch)")
    return growth / steps


def arm_b(epochs: int, shard_mb: float, n_clips: int):
    from ssl_vit_video_analytics_tpu.data.device_store import ChunkedDeviceClipStore

    class SynthClips:
        """Minimal ClipDataset stand-in: deterministic random-access clips."""
        mode, clip_len, image_size = "ssl", 16, 112

        def __len__(self):
            return n_clips

        def get_clip(self, i):
            rng = np.random.default_rng(i)
            return rng.integers(0, 255, (16, 112, 112, 3), dtype=np.uint8)

        def label(self, i):
            return 0

    ds = SynthClips()
    store = ChunkedDeviceClipStore(ds, shard_bytes=shard_mb * 1e6,
                                   batch_size=16)
    split_mb = n_clips * 16 * 112 * 112 * 3 / 1e6
    print(f"[arm B] chunked rotation: {epochs} epochs x {split_mb:.0f} MB "
          f"split, {store.num_shards} shards/epoch")
    peaks = []
    r0 = rss_mb()
    for ep in range(1, epochs + 1):
        t0 = time.time()
        nb = 0
        for batch in store.epoch_batches(16, shuffle=True, seed=0, epoch=ep):
            float(jnp.sum(batch["clip"][0, 0, 0, 0]))
            nb += 1
        peaks.append(rss_mb())
        print(f"  epoch {ep}: {nb} batches in {time.time() - t0:.1f}s "
              f"rss={peaks[-1]:8.1f} MB (+{peaks[-1] - r0:7.1f} vs start)",
              flush=True)
    # flatness: growth per epoch AFTER the first (warmup allocs amortized)
    per_epoch = (peaks[-1] - peaks[0]) / max(1, epochs - 1)
    print(f"[arm B] post-warmup RSS growth {per_epoch:.1f} MB/epoch "
          f"(epoch transfers {split_mb:.0f} MB) -> "
          f"{'FLAT (staging released on delete)' if per_epoch < 0.05 * split_mb else 'LEAKING'}")
    return per_epoch, split_mb


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--shard-mb", type=float, default=64)
    p.add_argument("--clips", type=int, default=512)
    p.add_argument("--steps-a", type=int, default=40)
    p.add_argument("--skip-a", action="store_true")
    args = p.parse_args()

    print(f"backend={jax.default_backend()} rss={rss_mb():.1f} MB")
    if not args.skip_a:
        arm_a(args.steps_a, 9.6)
    arm_b(args.epochs, args.shard_mb, args.clips)


if __name__ == "__main__":
    main()
