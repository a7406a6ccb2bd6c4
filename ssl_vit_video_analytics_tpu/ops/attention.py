"""Scaled dot-product attention with selectable implementation.

The reference leans on torch's fused ``scaled_dot_product_attention``
(ref: src/models/tiny_vit.py:103) and nn.MultiheadAttention
(ref: src/models/mobilevit.py:40). Here the same math is one function with two
backends:

- ``xla``: plain einsum + softmax. XLA fuses this well at the sequence
  lengths used by these models and it runs anywhere (CPU tests).
- ``pallas``: a blockwise flash-attention TPU kernel
  (see ``flash_attention.py``) for the long-sequence hot spot — the
  pipeline-B MAE decoder attends over T*196 = 3136 tokens.

Layout convention everywhere: [B, L, H, Dh] (batch, sequence, heads, head dim).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_DEFAULT_IMPL: str | None = None  # None -> auto: pallas on TPU, xla elsewhere

# Sequence-parallel runtime: a mesh registered by the training entry point
# (entry/common.setup_parallelism) that modules built with attn_impl="sp"
# shard their attention sequence over (parallel/sp.py).
_SP_MESH = None
_SP_AXIS = "seq"


def set_default_impl(impl: str | None) -> None:
    global _DEFAULT_IMPL
    assert impl in ("xla", "pallas", None)
    _DEFAULT_IMPL = impl


def set_sp_mesh(mesh, axis: str = "seq") -> None:
    """Register (or clear, with None) the sequence-parallel mesh."""
    global _SP_MESH, _SP_AXIS
    _SP_MESH, _SP_AXIS = mesh, axis


def get_sp_mesh():
    return _SP_MESH, _SP_AXIS


def resolve_impl(impl: str | None, kv_len: int) -> str:
    """Resolve the attention backend for a given kv length.

    None -> auto: the packed-layout Pallas flash kernel on TPU (no [L, L]
    logits in HBM, no head-split lane padding, no layout transposes), XLA on
    CPU (interpret-mode pallas is only for tests).
    """
    impl = impl or _DEFAULT_IMPL
    if impl == "sp":
        # degrade to auto when no SP mesh is registered (single device) or
        # the sequence does not divide over the mesh axis
        if _SP_MESH is None or kv_len % _SP_MESH.shape[_SP_AXIS] != 0:
            impl = None
    if impl is None:
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    return impl


def sdpa(q: jax.Array, k: jax.Array, v: jax.Array, impl: str | None = None) -> jax.Array:
    """softmax(q k^T / sqrt(Dh)) v over [B, L, H, Dh] inputs."""
    impl = resolve_impl(impl, k.shape[1])
    if impl == "pallas":
        from .flash_attention import flash_attention
        return flash_attention(q, k, v)
    return _sdpa_xla(q, k, v)


@functools.partial(jax.named_call, name="sdpa_xla")
def _sdpa_xla(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    dh = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, dtype=jnp.float32))
    logits = jnp.einsum("blhd,bmhd->bhlm", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhlm,bmhd->blhd", probs, v)
