"""Measure the ceiling of fusing the qkv Dense into the flash kernel
(VERDICT r3 #4a), before writing any kernel code.

What fusion could save is the qkv activation's HBM round trips: the Dense
writes [B, L, 3HD] to HBM, the flash forward reads it back, the flash
backward reads it again, writes dq/dk/dv, and the Dense backward reads those.
What fusion can NOT save is the projection matmul FLOPs (they move inside
the kernel, and the backward either stashes q/k/v anyway or recomputes
them). So the ceiling is:

    t_measured(qkv fwd+bwd) - t_roofline(matmul flops)  per block,
summed over the model's attention blocks. If that is small relative to the
231 ms step, the fused kernel cannot pay for its complexity — a measured
negative closes the lever.

Also times the flash kernel itself at each shape for context, and a
"dense+flash together under one jit" arm so any XLA-level fusion already
happening is counted honestly.

Run (chip): python scripts/probe_qkv_fusion.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import ssl_vit_video_analytics_tpu  # noqa: F401  (flips jax to CPU when JAX_PLATFORM_NAME=cpu — works offline)

import jax
import jax.numpy as jnp
import numpy as np

from ssl_vit_video_analytics_tpu.ops.flash_attention import flash_attention_packed

SUSTAINED_BF16 = 175e12  # measured through this tunnel (BENCH.md)

# (name, rows, L, C_in, H, d, blocks_per_step) at B=16 production shapes:
# stage-2/3 fold frames into rows (16 clips x 16 frames), decoder runs
# per-clip over T*196 tokens.
SHAPES = [
    ("stage2", 256, 784, 192, 6, 32, 2),
    ("stage3", 256, 196, 384, 12, 32, 6),
    ("decoder", 16, 3136, 384, 6, 64, 4),
]


def _sync(out):
    # float() forces a real sync through the axon tunnel; index only when
    # the leaf has rank (the loss leaf is a 0-dim scalar)
    leaf = jax.tree.leaves(out)[0]
    if leaf.ndim:
        leaf = leaf[..., 0]
    float(jnp.sum(leaf.astype(jnp.float32)))


def timed(fn, *args, iters=20, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    shapes, iters = SHAPES, 20
    if not on_tpu:  # CPU smoke: tiny shapes, just prove the arms run
        shapes = [("smoke", 2, 128, 32, 2, 16, 1)]
        iters = 2
    rng = np.random.default_rng(0)
    total_ceiling = 0.0
    print(f"backend={jax.default_backend()}  (subtract ~4 ms/line tunnel "
          "dispatch overhead)")
    for name, B, L, C, H, d, nblocks in shapes:
        HD = H * d
        x = jnp.asarray(rng.standard_normal((B, L, C)) * 0.02, dtype)
        w = jnp.asarray(rng.standard_normal((C, 3 * HD)) * 0.02, dtype)
        b = jnp.zeros((3 * HD,), dtype)

        def qkv_loss(x, w, b):
            y = x @ w + b
            return jnp.sum(y.astype(jnp.float32) ** 2)

        qkv_vg = jax.jit(jax.value_and_grad(qkv_loss, argnums=(0, 1)))

        def attn_loss(x, w, b):
            y = x @ w + b
            q, k, v = jnp.split(y, 3, axis=-1)
            o = flash_attention_packed(q, k, v, H)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        attn_vg = jax.jit(jax.value_and_grad(attn_loss, argnums=(0, 1)))

        t_qkv = timed(qkv_vg, x, w, b, iters=iters)
        t_attn = timed(attn_vg, x, w, b, iters=iters)
        # fwd + dx + dw matmuls = 3x fwd flops
        flops = 3 * 2.0 * B * L * C * 3 * HD
        t_roof = flops / SUSTAINED_BF16 * 1e3
        ceil = max(0.0, t_qkv - t_roof) * nblocks
        total_ceiling += ceil
        print(f"{name:8s} qkv[{B}x{L}x{C}->{3*HD}] fwd+bwd {t_qkv:6.2f} ms "
              f"(roofline {t_roof:5.2f}) | dense+flash {t_attn:6.2f} ms | "
              f"x{nblocks} blocks -> fusable ceiling {ceil:6.2f} ms")
    print(f"TOTAL qkv-fusion ceiling (upper bound, incl. dispatch overhead): "
          f"{total_ceiling:.1f} ms per 231 ms step")


if __name__ == "__main__":
    main()
