"""Tensor-parallel parameter sharding rules.

Megatron-style sharding for the transformer stacks without touching model
code: walk the param tree, match layer names, and assign PartitionSpecs —
column-parallel for the up-projections (qkv, mlp fc1), row-parallel for the
down-projections (attn proj, mlp fc2). Under jit, XLA propagates the
shardings through the matmuls and inserts the all-reduce after each
row-parallel layer (the scaling-book recipe: annotate, let XLA insert
collectives).

Applies to the MAE decoders and temporal transformers (TransformerEncoder /
MAEDecoder param naming from models/layers.py). Convolutional backbones stay
replicated — at 21M params they are far below the threshold where TP pays,
but the decoder demonstrates the full dp x tp mesh and keeps the door open
for larger variants.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path-substring, param-name, spec-builder) — first match wins.
# Dense kernels are [in, out]: column-parallel shards out (axis 1),
# row-parallel shards in (axis 0).
TP_RULES = (
    ("qkv", "kernel", lambda axis: P(None, axis)),       # column parallel
    ("qkv", "bias", lambda axis: P(axis)),
    ("proj", "kernel", lambda axis: P(axis, None)),      # row parallel
    ("Mlp_0/Dense_0", "kernel", lambda axis: P(None, axis)),
    ("Mlp_0/Dense_0", "bias", lambda axis: P(axis)),
    ("Mlp_0/Dense_1", "kernel", lambda axis: P(axis, None)),
)


def tp_spec_for(path_str: str, leaf, axis: str = "model"):
    """PartitionSpec for one param, or replicated P() if no rule matches."""
    name = path_str.rsplit("/", 1)[-1]
    for substr, pname, build in TP_RULES:
        if substr in path_str and name == pname:
            spec = build(axis)
            # only shard if the dimension is divisible (checked by caller)
            return spec
    return P()


def shard_params_tp(params, mesh: Mesh, axis: str = "model"):
    """device_put each param with its TP spec; non-divisible dims replicate."""
    axis_size = mesh.shape[axis]

    def place(path, leaf):
        path_str = "/".join(str(getattr(k, "key", k)) for k in path)
        spec = tp_spec_for(path_str, leaf, axis)
        # verify divisibility; fall back to replication
        for dim, part in enumerate(spec):
            if part is not None and leaf.shape[dim] % axis_size != 0:
                spec = P()
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def _key_name(k) -> str:
    return str(getattr(k, "key", getattr(k, "name", k)))


def shard_state_tp(state, mesh: Mesh, axis: str = "model"):
    """Shard a whole TrainState (params, opt_state moments, batch_stats, EMA)
    under the TP rules on a dp x tp mesh.

    Works on any pytree whose leaf paths end in the param path: optax's
    Adam mu/nu subtrees mirror the params tree, so the same substring rules
    place each moment exactly like its param; everything unmatched (conv
    backbone, BN stats, scalars) replicates. This is what makes TP
    user-reachable from a training entry (the optimizer state MUST be sharded
    like the params or every update pays a full all-gather).
    """
    axis_size = mesh.shape[axis]

    def place(path, leaf):
        if leaf is None or not hasattr(leaf, "shape"):
            return leaf
        path_str = "/".join(_key_name(k) for k in path)
        spec = tp_spec_for(path_str, leaf, axis)
        for dim, part in enumerate(spec):
            if part is not None and (
                    leaf.ndim <= dim or leaf.shape[dim] % axis_size != 0):
                spec = P()
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, state)


def count_sharded(params, mesh: Mesh, axis: str = "model") -> tuple[int, int]:
    """(n_sharded_leaves, n_total_leaves) under the TP rules — for logging."""
    axis_size = mesh.shape[axis]
    n_sharded = n_total = 0

    def visit(path, leaf):
        nonlocal n_sharded, n_total
        n_total += 1
        path_str = "/".join(str(getattr(k, "key", k)) for k in path)
        spec = tp_spec_for(path_str, leaf, axis)
        ok = any(p is not None for p in spec) and all(
            p is None or leaf.shape[d] % axis_size == 0 for d, p in enumerate(spec))
        n_sharded += bool(ok)
        return leaf

    jax.tree_util.tree_map_with_path(visit, params)
    return n_sharded, n_total
