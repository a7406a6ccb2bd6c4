"""Probe per-dispatch overhead and sustained matmul rate through the tunnel.

Times a trivial jitted op and matmuls at three sizes with the same
10-iters-per-sync loop profile_pieces uses; the y-intercept of time-vs-work
is the per-dispatch overhead.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)
dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


def bench(fn, *args, iters=10, tag=""):
    jfn = jax.jit(fn)
    for _ in range(3):
        out = jfn(*args)
    float(jax.tree.leaves(out)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    float(jax.tree.leaves(out)[0].reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters * 1000.0
    print(f"{tag:36s} {dt:9.3f} ms", flush=True)
    return dt


x = jnp.asarray(rng.standard_normal((8, 128)), dtype)
t_triv = bench(lambda a: a + 1.0, x, tag="trivial add [8,128]")

for n in (2048, 4096, 8192):
    a = jnp.asarray(rng.standard_normal((n, n)), dtype)
    dt = bench(lambda a: jnp.sum((a @ a).astype(jnp.float32)), a,
               tag=f"matmul {n}^3")
    tf = 2 * n ** 3 / (dt / 1000.0) / 1e12
    tf_c = 2 * n ** 3 / ((dt - t_triv) / 1000.0) / 1e12 if dt > t_triv else float("nan")
    print(f"{'-> TF/s raw / overhead-corrected':36s} {tf:7.1f} / {tf_c:7.1f}")
