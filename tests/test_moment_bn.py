"""Moment-BN equivalence: ConvBNAct's 1x1 train-mode fast path (BN stats
derived from input moments, models/layers.py ConvBNAct docstring) must match
the direct nn.Conv + nn.BatchNorm computation — outputs, updated running
stats, and gradients. The path is opt-in (slower on-chip at TinyViT shapes,
see BENCH.md round-3 notes), so the flag is forced on here."""
import os

os.environ["SSL_VIT_TPU_MOMENT_BN"] = "1"

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ssl_vit_video_analytics_tpu.models.layers import ConvBNAct


class DirectConvBN(nn.Module):
    """The pre-moment-trick path, param-tree-identical to ConvBNAct."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (1, 1), strides=(1, 1),
                    padding=[(0, 0), (0, 0)], use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(x)
        return x


def test_moment_bn_matches_direct_bn():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 6, 6, 8)) * 1.7 + 0.5, jnp.float32)

    moment = ConvBNAct(features=24, kernel=1, act=False)
    direct = DirectConvBN(features=24)
    variables = direct.init(jax.random.key(0), x, train=False)
    # identical trees by construction: reuse the same params in both modules
    for m in (moment, direct):
        out, mut = m.apply(variables, x, train=True, mutable=["batch_stats"])
        if m is direct:
            ref_out, ref_mut = out, mut
        else:
            got_out, got_mut = out, mut
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               atol=2e-5, rtol=2e-5)
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(got_mut["batch_stats"]["BatchNorm_0"][k]),
            np.asarray(ref_mut["batch_stats"]["BatchNorm_0"][k]),
            atol=2e-5, rtol=2e-5)

    def loss(m, params, xx):
        out, _ = m.apply({"params": params,
                          "batch_stats": variables["batch_stats"]},
                         xx, train=True, mutable=["batch_stats"])
        return jnp.sum(jnp.sin(out))

    g_ref = jax.grad(lambda p: loss(direct, p, x))(variables["params"])
    g_got = jax.grad(lambda p: loss(moment, p, x))(variables["params"])
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-5)
    gx_ref = jax.grad(lambda xx: loss(direct, variables["params"], xx))(x)
    gx_got = jax.grad(lambda xx: loss(moment, variables["params"], xx))(x)
    np.testing.assert_allclose(np.asarray(gx_got), np.asarray(gx_ref),
                               atol=5e-5, rtol=5e-5)


def test_moment_bn_eval_unchanged():
    """Eval mode must use running stats via the standard BN path."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 8)), jnp.float32)
    m = ConvBNAct(features=16, kernel=1, act=False)
    v = m.init(jax.random.key(0), x, train=False)
    out1 = m.apply(v, x, train=False)
    out2 = m.apply(v, x, train=False)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
