"""Flash-attention kernel vs XLA reference: forward and gradients,
including non-128-aligned L (196) and head dims (40)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssl_vit_video_analytics_tpu.ops.attention import _sdpa_xla
from ssl_vit_video_analytics_tpu.ops.flash_attention import flash_attention


@pytest.mark.parametrize("B,L,H,D", [(2, 128, 2, 32), (1, 196, 4, 40), (1, 300, 2, 64),
                                     (8, 196, 3, 32)])  # B=8, short L -> G-batched grid
def test_forward_matches_xla(B, L, H, D):
    ks = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(ks[0], (B, L, H, D))
    k = jax.random.normal(ks[1], (B, L, H, D))
    v = jax.random.normal(ks[2], (B, L, H, D))
    ref = _sdpa_xla(q, k, v)
    out = jax.jit(flash_attention)(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("B,L,H,D", [(1, 196, 2, 32), (8, 196, 3, 32),
                                     (1, 784, 2, 32)])  # 784 -> 2 q-blocks of 392
def test_grads_match_xla(B, L, H, D):
    ks = jax.random.split(jax.random.key(1), 3)
    q = jax.random.normal(ks[0], (B, L, H, D))
    k = jax.random.normal(ks[1], (B, L, H, D))
    v = jax.random.normal(ks[2], (B, L, H, D))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(_sdpa_xla(q, k, v)))

    def loss_fa(q, k, v):
        return jnp.sum(jnp.sin(flash_attention(q, k, v)))

    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    g_fa = jax.jit(jax.grad(loss_fa, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(g_fa, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-5)
