"""Sub-piece micro-benchmarks: find where the non-attention transformer time
goes (MLP matmuls vs LayerNorm vs downsample MBConv vs BN) at pipeline-B
shapes. Run: python scripts/profile_micro.py [B] [piece,...]
pieces: mlp ln block mbdown dense qkv
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ssl_vit_video_analytics_tpu.models.layers import Mlp, MBConv, TransformerBlock


def bench(fn, *args, warmup=2, iters=10, tag=""):
    jfn = jax.jit(fn)
    for _ in range(warmup):
        out = jfn(*args)
    float(jax.tree.leaves(out)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    float(jax.tree.leaves(out)[0].reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters * 1000.0
    print(f"{tag:46s} {dt:9.2f} ms", flush=True)
    return dt


def grad_bench(module, x, tag, **mode):
    variables = jax.jit(lambda k: module.init(k, x, **mode))(jax.random.key(0))
    params = variables["params"]
    bs = variables.get("batch_stats")

    def loss_fn(p, xx):
        v = {"params": p}
        if bs is not None:
            v["batch_stats"] = bs
            out, _ = module.apply(v, xx, mutable=["batch_stats"], **mode)
        else:
            out = module.apply(v, xx, **mode)
        return jnp.sum(out.astype(jnp.float32))

    return bench(lambda p, xx: jax.value_and_grad(loss_fn)(p, xx), params, x, tag=tag)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    want = lambda n: only is None or n in only
    BT = B * 16
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} B={B} BT={BT}", flush=True)

    # decoder-shaped token tensor [B, 3136, 384] and stage3 [BT, 196, 384]
    xd = jnp.asarray(rng.standard_normal((B, 3136, 384)), dtype)

    if want("mlp"):
        grad_bench(Mlp(1536, dtype=dtype), xd, "mlp d384->1536->384 [B,3136]",
                   deterministic=True)

    if want("ln"):
        ln = nn.LayerNorm(dtype=dtype)
        grad_bench(ln, xd, "layernorm [B,3136,384]")

    if want("qkv"):
        grad_bench(nn.Dense(1152, dtype=dtype), xd, "dense 384->1152 [B,3136]")
        x2 = xd.reshape(B * 3136, 384)
        grad_bench(nn.Dense(1152, dtype=dtype), x2, "dense 384->1152 [B*3136] 2D")

    if want("block"):
        grad_bench(TransformerBlock(6, mlp_ratio=4.0, dtype=dtype), xd,
                   "1 full tblock (attn+mlp) [B,3136,384]", deterministic=False)

    if want("mbdown"):
        x56 = jnp.asarray(rng.standard_normal((BT, 56, 56, 96)), dtype)
        grad_bench(MBConv(192, stride=2, dtype=dtype), x56,
                   "MBConv down 56^2x96 -> 28^2x192", train=True)
        x28 = jnp.asarray(rng.standard_normal((BT, 28, 28, 192)), dtype)
        grad_bench(MBConv(384, stride=2, dtype=dtype), x28,
                   "MBConv down 28^2x192 -> 14^2x384", train=True)


if __name__ == "__main__":
    main()
