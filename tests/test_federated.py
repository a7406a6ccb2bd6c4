"""Federated core: aggregation dtype rules, client selection parity,
mesh-parallel round execution on the 8-device CPU mesh.

Flake hardening (VERDICT r3 #7): the two shard_map round tests are the ones
that intermittently die with a bare "Fatal Python error:" when ANOTHER
process is concurrently attached to the axon tunnel (CLAUDE.md; 3/3 isolated
runs pass). The crash kills the whole pytest process, so the only robust
retry is process isolation: each runs in a child pytest (its ``_inner``
variant, skipped in normal collection) with ONE retry on the crash
signature. Genuine assertion failures are NOT retried — they propagate from
the first child run.
"""
import os
import random
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

_INNER = os.environ.get("FED_SHARDMAP_INNER") == "1"
_FLAKE_SIG = "Fatal Python error"


def _run_isolated(inner_test: str):
    cmd = [sys.executable, "-m", "pytest", "-q", "-x", "-p", "no:cacheprovider",
           f"{os.path.abspath(__file__)}::{inner_test}"]
    env = {**os.environ, "FED_SHARDMAP_INNER": "1"}
    for attempt in (1, 2):
        r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                           timeout=600)
        if r.returncode == 0:
            return
        crashed = r.returncode < 0 or _FLAKE_SIG in (r.stdout + r.stderr)
        if crashed and attempt == 1:
            print(f"[flake] {inner_test} crashed (tunnel contention?); "
                  "retrying once", flush=True)
            continue
        raise AssertionError(
            f"{inner_test} failed (rc={r.returncode}, attempt {attempt}):\n"
            f"{r.stdout[-2000:]}\n{r.stderr[-2000:]}")

from ssl_vit_video_analytics_tpu.federated import (
    fedavg_aggregate, broadcast_tree, select_clients,
    make_parallel_client_update, run_fedavg_round,
    model_size_bytes, estimate_comm_mb_per_round, estimate_raw_upload_mb,
)
from ssl_vit_video_analytics_tpu.models import MobileViTBackbone, VideoClassifier
from ssl_vit_video_analytics_tpu.ops.preprocess import normalize_clip
from ssl_vit_video_analytics_tpu.parallel.mesh import make_mesh


def test_fedavg_aggregate_dtype_rules():
    stacked = {
        "w": jnp.stack([jnp.ones((2, 2)) * 1.0, jnp.ones((2, 2)) * 3.0]),
        "counter": jnp.stack([jnp.array([5], jnp.int32), jnp.array([9], jnp.int32)]),
    }
    # weights 1:3 -> float mean = 1*0.25 + 3*0.75 = 2.5; int -> max = 9
    out = fedavg_aggregate(stacked, jnp.array([1.0, 3.0]))
    np.testing.assert_allclose(np.asarray(out["w"]), 2.5)
    assert int(out["counter"][0]) == 9


def test_select_clients_reference_rng():
    rng = random.Random(42)
    ours = select_clients(rng, 5, 1.0)
    rng2 = random.Random(42)
    theirs = rng2.sample(list(range(5)), max(1, int(5 * 1.0)))
    assert ours == theirs


def test_comm_cost_formulas():
    params = {"w": jnp.zeros((1000,), jnp.float32)}
    assert model_size_bytes(params) == 4000
    total, per_model = estimate_comm_mb_per_round(params, 5)
    assert abs(total - 2 * 5 * per_model) < 1e-9
    mb = estimate_raw_upload_mb(10, clip_len=4, image_size=8)
    assert abs(mb - 10 * 3 * 4 * 64 / (1024 * 1024)) < 1e-9


def test_parallel_fedavg_round_on_mesh():
    _run_isolated("test_parallel_fedavg_round_on_mesh_inner")


def test_fedavg_round_pads_ragged_client_count():
    _run_isolated("test_fedavg_round_pads_ragged_client_count_inner")


@pytest.mark.skipif(not _INNER, reason="runs via the isolated wrapper above")
def test_parallel_fedavg_round_on_mesh_inner():
    n_dev = jax.device_count()
    mesh = make_mesh({"client": n_dev})
    N, S, B, T, sz = n_dev, 2, 2, 2, 32
    model = VideoClassifier(backbone=MobileViTBackbone(embed_dim=16), num_classes=4)
    v = jax.jit(lambda k: model.init(k, jnp.zeros((B, T, sz, sz, 3))))(jax.random.key(0))

    upd = make_parallel_client_update(model, lr=1e-3, weight_decay=0.01,
                                      normalize_fn=normalize_clip, mesh=mesh)
    rng = np.random.default_rng(0)
    csh = NamedSharding(mesh, P("client"))
    batches = {
        "clip": jax.device_put(rng.integers(0, 255, (N, S, B, T, sz, sz, 3), dtype=np.uint8), csh),
        "label": jax.device_put(rng.integers(0, 4, (N, S, B), dtype=np.int32), csh),
        "valid": jax.device_put(np.ones((N, S, B), bool), csh),
    }
    # make the last step of client 0 fully padded -> must be a no-op for it
    valid = np.ones((N, S, B), bool)
    valid[0, -1] = False
    batches["valid"] = jax.device_put(valid, csh)

    new_p, new_bs, losses = run_fedavg_round(
        upd, v["params"], v["batch_stats"], batches,
        np.full((N,), 10.0, np.float32), mesh=mesh)
    assert np.isfinite(np.asarray(losses)).all()
    # aggregated params differ from init (training happened)
    p0 = jax.tree.leaves(v["params"])[0]
    p1 = jax.tree.leaves(new_p)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    # aggregated tree has the global (unstacked) structure
    assert p1.shape == p0.shape


@pytest.mark.skipif(not _INNER, reason="runs via the isolated wrapper above")
def test_fedavg_round_pads_ragged_client_count_inner():
    """client_fraction < 1 can select any m; dummy-client padding makes the
    stacked dim shard over the full mesh axis (ADVICE r1: m=5 on 8 devices)."""
    n_dev = jax.device_count()
    mesh = make_mesh({"client": n_dev})
    N = n_dev // 2 + 1  # 5 on the 8-device test mesh: not divisible
    S, B, T, sz = 2, 2, 2, 32
    model = VideoClassifier(backbone=MobileViTBackbone(embed_dim=16), num_classes=4)
    v = jax.jit(lambda k: model.init(k, jnp.zeros((B, T, sz, sz, 3))))(jax.random.key(0))
    upd = make_parallel_client_update(model, lr=1e-3, weight_decay=0.01,
                                      normalize_fn=normalize_clip, mesh=mesh)
    rng = np.random.default_rng(0)
    batches = {
        "clip": rng.integers(0, 255, (N, S, B, T, sz, sz, 3), dtype=np.uint8),
        "label": rng.integers(0, 4, (N, S, B), dtype=np.int32),
        "valid": np.ones((N, S, B), bool),
    }
    new_p, new_bs, losses = run_fedavg_round(
        upd, v["params"], v["batch_stats"], batches,
        np.full((N,), 10.0, np.float32), mesh=mesh)
    assert losses.shape[0] == N  # dummies sliced away
    assert np.isfinite(np.asarray(losses)).all()
    p0, p1 = jax.tree.leaves(v["params"])[0], jax.tree.leaves(new_p)[0]
    assert p1.shape == p0.shape
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


def test_pad_clients_identity_when_divisible():
    from ssl_vit_video_analytics_tpu.federated.core import pad_clients_to_axis
    b = {"clip": np.zeros((4, 1), np.uint8)}
    out, sizes, n = pad_clients_to_axis(b, np.ones((4,), np.float32), 4)
    assert out is b and n == 4 and sizes.shape == (4,)
    out2, sizes2, n2 = pad_clients_to_axis(b, np.ones((4,), np.float32), 8)
    assert n2 == 4 and out2["clip"].shape == (8, 1) and sizes2[4:].sum() == 0


def test_chunked_local_update_matches_unchunked():
    """Step-axis chunking (the HBM fix for production client sizes: a full
    round's stacked clips OOMed the chip at 27.7 GB) must be numerically
    identical to one scan over all S steps — optimizer state, BN stats, and
    loss sums carry across chunks; the padded tail is valid=False no-ops."""
    N, S, B, T, sz = 2, 5, 2, 2, 32
    model = VideoClassifier(backbone=MobileViTBackbone(embed_dim=16), num_classes=4)
    v = jax.jit(lambda k: model.init(k, jnp.zeros((B, T, sz, sz, 3))))(jax.random.key(0))
    rng = np.random.default_rng(3)
    batches = {
        "clip": rng.integers(0, 255, (N, S, B, T, sz, sz, 3), dtype=np.uint8),
        "label": rng.integers(0, 4, (N, S, B), dtype=np.int32),
        "valid": np.ones((N, S, B), bool),
    }
    sizes = np.full((N,), 10.0, np.float32)

    outs = {}
    for chunk in (S, 2):  # 2 does not divide S=5 -> exercises tail padding
        upd = make_parallel_client_update(
            model, lr=1e-3, weight_decay=0.01, normalize_fn=normalize_clip,
            mesh=None, step_chunk=chunk)
        outs[chunk] = run_fedavg_round(upd, v["params"], v["batch_stats"],
                                       batches, sizes, mesh=None)
    for a, b in zip(jax.tree.leaves(outs[S]), jax.tree.leaves(outs[2])):
        a, b = np.asarray(a), np.asarray(b)
        if np.issubdtype(a.dtype, np.floating):
            # chunk=5 and chunk=2 are DIFFERENT XLA programs (loop
            # partitioning changes fusion/codegen), so demand agreement to
            # ~1 ulp, not bit-identity — the suite observed a 2.4e-7 rel
            # drift when one arm loaded a compile-cache entry built on a
            # host with different CPU features
            np.testing.assert_allclose(a, b, rtol=3e-6, atol=1e-7)
        else:
            np.testing.assert_array_equal(a, b)
