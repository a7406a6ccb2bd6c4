"""Decompose stage-1 MBConv time in situ: bench MBConv variants with pieces
removed (SE, BN-train-stats, dw conv, gelus) to see what each costs WITH
XLA's cross-piece fusion, not standalone (standalone pieces double-count HBM
boundaries that fusion removes).

Run: python scripts/probe_mbconv_ablate.py [BT]
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ssl_vit_video_analytics_tpu.models.layers import ConvBNAct, SELayer


class MBConvVariant(nn.Module):
    features: int
    expand: int = 4
    use_se: bool = True
    use_dw: bool = True
    use_gelu: bool = True
    bn_train: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        train = train and self.bn_train
        in_ch = x.shape[-1]
        mid = in_ch * self.expand
        y = ConvBNAct(mid, kernel=1, act=False, dtype=self.dtype)(x, train)
        if self.use_gelu:
            y = nn.gelu(y)
        if self.use_dw:
            y = ConvBNAct(mid, kernel=3, groups=mid, act=False, dtype=self.dtype)(y, train)
            if self.use_gelu:
                y = nn.gelu(y)
        if self.use_se:
            y = SELayer(dtype=self.dtype)(y)
        y = ConvBNAct(self.features, kernel=1, act=False, dtype=self.dtype)(y, train)
        return x + y


def bench_variant(x, tag, **kw):
    m = MBConvVariant(features=x.shape[-1], **kw)
    variables = jax.jit(lambda k: m.init(k, x))(jax.random.key(0))
    params, bs = variables["params"], variables.get("batch_stats")

    def loss(p, xx):
        out, _ = m.apply({"params": p, "batch_stats": bs}, xx,
                         mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32))

    step = jax.jit(lambda p, xx: jax.value_and_grad(loss)(p, xx))
    for _ in range(3):
        out = step(params, x)
    float(out[0])
    t0 = time.perf_counter()
    for _ in range(10):
        out = step(params, x)
    float(out[0])
    dt = (time.perf_counter() - t0) / 10 * 1000.0
    print(f"{tag:46s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    BT = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BT, 56, 56, 96)), jnp.bfloat16)
    full = bench_variant(x, "full MBConv (ref)")
    no_se = bench_variant(x, "  -SE", use_se=False)
    no_dw = bench_variant(x, "  -dw conv", use_dw=False)
    no_gelu = bench_variant(x, "  -gelus", use_gelu=False)
    no_bn = bench_variant(x, "  -BN train stats (eval-mode BN)", bn_train=False)
    bare = bench_variant(x, "  pw convs only", use_se=False, use_dw=False,
                         use_gelu=False)
    print(f"\nin-situ deltas: SE={full-no_se:.1f} dw={full-no_dw:.1f} "
          f"gelu={full-no_gelu:.1f} bn_stats={full-no_bn:.1f} "
          f"bare={bare:.1f}")


if __name__ == "__main__":
    main()
