"""Sequence parallelism for the long-sequence attention path.

The reference has no SP/CP of any kind (SURVEY §5.7 — its longest sequence is
the pipeline-B decoder's T*196 = 3136 tokens). This module is the TPU-native
"longer clips don't require architectural change" escape hatch the SURVEY
calls for: queries are sharded over a mesh axis, K/V are all-gathered over
ICI once per layer, and each device runs the SAME packed-layout flash kernel
on its query shard (the kernel already supports Lq != Lk). Softmax is exact —
every shard sees the full key range — so the result is bit-identical to the
single-device kernel up to reduction order.

Memory/communication model per attention call at [B, L, H*d] on n devices:
  - activations held per device: q, o are [B, L/n, H*d] (1/n), gathered K/V
    are transient [B, L, H*d];
  - ICI traffic: 2 * (n-1)/n * B*L*H*d elements (the K/V all-gathers) —
    at T=64 clips (12544 tokens, d=384, bf16) that is ~9.6 MB per batch row,
    well under ICI bandwidth per step.

For TRAINING, the VJP of all_gather is a reduce-scatter, which XLA inserts
automatically — no custom backward is needed on top of the kernel's own VJP.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.flash_attention import flash_attention_packed


def sp_attention_packed(q: jax.Array, k: jax.Array, v: jax.Array,
                        num_heads: int, mesh: Mesh, axis: str = "seq"
                        ) -> jax.Array:
    """Flash attention with the SEQUENCE dim sharded over ``mesh[axis]``.

    q/k/v: packed [B, L, H*d] global arrays with L divisible by the axis
    size. Returns the packed [B, L, H*d] output with the same sharding.
    """
    B, L, HD = q.shape
    n = mesh.shape[axis]
    assert L % n == 0, f"L={L} not divisible by mesh axis {axis}={n}"

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, axis, None),) * 3,
        out_specs=P(None, axis, None),
        # the pallas_call's out_shape carries no varying-mesh-axes info
        check_vma=False,
    )
    def local(qs, ks, vs):
        kf = jax.lax.all_gather(ks, axis, axis=1, tiled=True)  # [B, L, HD]
        vf = jax.lax.all_gather(vs, axis, axis=1, tiled=True)
        return flash_attention_packed(qs, kf, vf, num_heads)

    spec = NamedSharding(mesh, P(None, axis, None))
    return local(jax.device_put(q, spec), jax.device_put(k, spec),
                 jax.device_put(v, spec))
