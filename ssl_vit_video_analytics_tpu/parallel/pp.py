"""Pipeline parallelism for homogeneous transformer-block stacks.

The reference has no parallelism of any kind (SURVEY §2: single-GPU,
sequential federated simulation). This module adds the TPU-native pipeline
axis the mesh design reserves: a stack of identical pre-norm transformer
blocks (the MAE decoders, models/mae.py; every block has the same param
shapes) is split into ``n_stages`` contiguous groups of blocks, one group per
device along a ``pipe`` mesh axis, and microbatches stream through the stages
GPipe-style.

Why this shape of PP (and not e.g. per-layer pjit sharding):
  - JAX/XLA expresses "different weights on different devices" most naturally
    as a STACKED param tree sharded on its leading (stage) axis — each device
    materializes only its own blocks' weights, so a decoder too big for one
    chip's HBM shards linearly over the pipe axis.
  - The schedule is a ``lax.scan`` over ``n_micro + n_stages - 1`` ticks.
    Every tick, each device applies its block group to its current activation
    and ``ppermute``s the result one stage forward over ICI (nearest-neighbor
    traffic only). Stage 0 injects microbatch ``t`` at tick ``t``; the last
    stage's tick-``t`` output is microbatch ``t - (n_stages-1)``.
  - Autodiff gives the backward pipeline for free: the VJP of ``ppermute`` is
    the inverse permutation, and the scan's saved activations are exactly
    GPipe's per-tick stash. No custom backward is needed.

Bubble accounting (standard GPipe): of ``n_micro + n_stages - 1`` ticks each
stage does useful work on ``n_micro``, so utilization is
``n_micro / (n_micro + n_stages - 1)`` — callers pick ``n_micro`` accordingly.
During fill/drain ticks a stage runs its blocks on a zeros/stale buffer; the
result is never selected into the output and pre-norm blocks are finite on a
zero input, so the wasted compute is harmless (and is what keeps every tick's
program identical, which is what XLA wants to compile).

Equivalence to the sequential stack is exact up to reduction order and is
pinned by tests/test_pp.py (forward AND grads, including k blocks per stage).
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def stack_block_params(params: dict, depth: int, prefix: str = "block") -> dict:
    """Stack ``params[f"{prefix}{i}"]`` for i in [0, depth) on a new leading
    stage axis.

    The blocks must be shape-homogeneous (true for every TransformerEncoder
    in this package). The result is the pipeline's param tree: leaves
    ``[depth, ...]``, to be sharded ``P(axis)`` on the leading dim.
    """
    blocks = [params[f"{prefix}{i}"] for i in range(depth)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def unstack_block_params(stacked: dict, prefix: str = "block") -> dict:
    """Inverse of :func:`stack_block_params` (for checkpoint round-trips)."""
    depth = jax.tree.leaves(stacked)[0].shape[0]
    return {f"{prefix}{i}": jax.tree.map(lambda a: a[i], stacked)
            for i in range(depth)}


def pipeline_apply(
    block_fn: Callable[[dict, jax.Array], jax.Array],
    stacked_params: dict,
    x: jax.Array,
    n_micro: int,
    mesh: Mesh,
    axis: str = "pipe",
) -> jax.Array:
    """Apply ``depth`` stacked blocks to ``x`` pipelined over ``mesh[axis]``.

    Args:
      block_fn: ``(single_block_params, activation) -> activation`` — one
        block's forward, shape-preserving (e.g. a ``TransformerBlock.apply``
        closure).
      stacked_params: pytree with leading axis ``depth`` (from
        :func:`stack_block_params`); ``depth`` must be divisible by the mesh
        axis size, giving ``depth // n_stages`` blocks per stage.
      x: ``[B, ...]`` batch; ``B`` divisible by ``n_micro``.
      n_micro: number of microbatches to stream (>= 1).
      mesh / axis: the pipeline mesh axis.

    Returns ``[B, ...]`` — equal (up to reduction order) to applying the
    blocks sequentially.
    """
    n_stages = mesh.shape[axis]
    depth = jax.tree.leaves(stacked_params)[0].shape[0]
    if depth % n_stages:
        raise ValueError(f"depth={depth} not divisible by {axis}={n_stages}")
    B = x.shape[0]
    if B % n_micro:
        raise ValueError(f"batch={B} not divisible by n_micro={n_micro}")
    mb = B // n_micro
    x_mb = x.reshape((n_micro, mb) + x.shape[1:])
    n_ticks = n_micro + n_stages - 1

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(axis), stacked_params), P()),
        out_specs=P(axis),
        # block_fn may contain pallas calls whose out_shape carries no
        # varying-mesh-axes info (same caveat as parallel/sp.py).
        check_vma=False,
    )
    def run(params_local, x_all):
        # params_local leaves: [depth // n_stages, ...] — this stage's blocks.
        stage_idx = jax.lax.axis_index(axis)

        def stage_chain(act):
            def body(a, p_i):
                return block_fn(p_i, a), None
            out, _ = jax.lax.scan(body, act, params_local)
            return out

        def tick(buf, t):
            inj = x_all[jnp.minimum(t, n_micro - 1)]
            cur = jnp.where((stage_idx == 0) & (t < n_micro), inj, buf)
            y = stage_chain(cur)
            nxt = jax.lax.ppermute(
                y, axis, [(i, i + 1) for i in range(n_stages - 1)])
            return nxt, y

        _, ys = jax.lax.scan(tick, jnp.zeros_like(x_all[0]),
                             jnp.arange(n_ticks))
        # On the LAST stage, tick t's output is microbatch t-(n_stages-1);
        # other stages return garbage in this slot (sliced away by out_specs).
        return ys[n_stages - 1:][None]  # [1, n_micro, mb, ...] per device

    spec = NamedSharding(mesh, P())
    out = run(
        jax.tree.map(
            lambda a: jax.device_put(
                a, NamedSharding(mesh, P(*(axis,) + (None,) * (a.ndim - 1)))),
            stacked_params),
        jax.device_put(x_mb, spec))
    # out: [n_stages, n_micro, mb, ...] sharded on the stage axis; only the
    # last stage's shard holds real outputs.
    return out[-1].reshape(x.shape)


def pipeline_transformer_encoder(
    block_module,
    encoder_params: dict,
    x: jax.Array,
    n_micro: int,
    mesh: Mesh,
    axis: str = "pipe",
) -> jax.Array:
    """Pipeline a TransformerEncoder's ``block{i}`` stack.

    ``block_module`` is a constructed TransformerBlock with the SAME config
    the encoder used (num_heads / mlp_ratio / dtype / attn_impl);
    ``encoder_params`` is the encoder's param subtree (``{"block0": ...}``).
    Deterministic path only (dropout=0 everywhere in this package's decoders).
    """
    depth = sum(1 for k in encoder_params if k.startswith("block"))
    stacked = stack_block_params(encoder_params, depth)

    def block_fn(p, a):
        return block_module.apply({"params": p}, a, True)

    return pipeline_apply(block_fn, stacked, x, n_micro, mesh, axis=axis)
