"""Microbench: in-VMEM exp throughput at fp32 vs bf16 (BENCH.md lever #2).

Round-2 note: softmax exp is ~1G VPU transcendentals per attention call each
direction; bf16 exp measured no faster when HBM-bound, in-VMEM untested.
This isolates the VPU: one grid cell, VMEM-resident block, N exp applications
inside the kernel, so HBM traffic is constant while transcendental work
scales with N. Slope(ms, N) = per-application cost.

Run: python scripts/probe_exp.py
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


OPS = {
    "exp": lambda a, dtype: jnp.exp(a * jnp.asarray(0.12, dtype)),
    "tanh": lambda a, dtype: jnp.tanh(a + jnp.asarray(0.1, dtype)),
    "gelu": lambda a, dtype: jax.nn.gelu(a + jnp.asarray(0.1, dtype)),
    "fma": lambda a, dtype: a * jnp.asarray(0.9991, dtype) + jnp.asarray(1e-4, dtype),
}


def make_kernel(n_exp: int, dtype, op: str):
    fn = OPS[op]

    def kernel(x_ref, o_ref):
        x = x_ref[...].astype(dtype)
        # data-dependent chain so Mosaic cannot hoist/CSE the applications
        acc = jax.lax.fori_loop(0, n_exp, lambda i, a: fn(a, dtype), x)
        o_ref[...] = acc.astype(o_ref.dtype)

    return kernel


def bench(rows, lanes, n_exp, dtype, op="exp", iters=30):
    x = jnp.asarray(np.random.default_rng(0).standard_normal((rows, lanes)),
                    jnp.float32)
    fn = jax.jit(lambda x: pl.pallas_call(
        make_kernel(n_exp, dtype, op),
        out_shape=jax.ShapeDtypeStruct((rows, lanes), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(x))
    for _ in range(3):
        out = fn(x)
    float(out[0, 0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    float(out[0, 0])
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    rows, lanes = 896, 6272  # 2x decoder block: 5.6M elements, 22 MB f32
    n_elem = rows * lanes
    lo, hi = 4, 516  # 512 extra applications: seconds of VPU work, far
    # above the ~1.2 ms dispatch floor that swallowed the first attempts
    for op in ("exp", "tanh", "gelu", "fma"):
        for dtype in (jnp.float32, jnp.bfloat16):
            t_lo = bench(rows, lanes, lo, dtype, op)
            t_hi = bench(rows, lanes, hi, dtype, op)
            per = (t_hi - t_lo) / (hi - lo)
            rate = n_elem / (per / 1000.0) / 1e9
            print(f"{op:5s} {dtype.__name__:9s} per-application {per:7.4f} ms "
                  f"-> {rate:8.2f} G/s  (t{lo}={t_lo:.3f} t{hi}={t_hi:.3f})",
                  flush=True)


if __name__ == "__main__":
    main()
