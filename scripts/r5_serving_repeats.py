"""Round-5: canonicalize the serving-latency headline (VERDICT r4 weak #4).

Two headline p50s existed (4.03 driver bench vs 3.61 builder queue), ~12%
apart across tunnel sessions. This runs bench.serving_latency N times in ONE
process/session and reports p50 mean +- sd plus the pooled percentile, so the
headline carries a variance bar and a canonical definition: the driver
BENCH_r*.json series is canonical; this script quantifies its session spread.

Run (chip): python scripts/r5_serving_repeats.py [N]
"""
from __future__ import annotations

import json
import sys

import jax
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import bench


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    on_tpu = jax.default_backend() == "tpu"
    p50s, p95s = [], []
    for i in range(n):
        p50, p95, impl = bench.serving_latency(on_tpu)
        p50s.append(p50)
        p95s.append(p95)
        print(f"[serving] repeat {i+1}/{n}: p50={p50:.2f} p95={p95:.2f} ms/clip "
              f"({impl})", flush=True)
    out = {
        "metric": "serving_p50_ms_per_clip",
        "n_repeats": n,
        "impl": impl,
        "p50_mean": round(float(np.mean(p50s)), 3),
        "p50_sd": round(float(np.std(p50s)), 3),
        "p50_min": round(float(np.min(p50s)), 3),
        "p50_max": round(float(np.max(p50s)), 3),
        "p95_mean": round(float(np.mean(p95s)), 3),
    }
    print(json.dumps(out))
    with open("results/serving_repeats_r5.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
