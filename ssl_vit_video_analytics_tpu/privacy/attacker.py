"""FeatureAttacker: 2-layer MLP re-identification probe for feature-leakage
estimation (ref: src/privacy/attacker.py:5-18), plus its jitted training loop
(ref: src/run_privacy.py:309-326 trains it with Adam + CE for a few epochs).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn


class FeatureAttacker(nn.Module):
    num_classes: int

    @nn.compact
    def __call__(self, z):
        d = z.shape[-1]
        h = nn.Dense(d)(z)
        h = nn.relu(h)
        return nn.Dense(self.num_classes)(h)


def train_attacker(
    key: jax.Array,
    embeddings: jax.Array,   # [N, D] clean or perturbed embeddings
    labels: jax.Array,       # [N] int
    num_classes: int,
    epochs: int = 10,
    lr: float = 1e-3,
    batch_size: int | None = None,
) -> tuple[dict, float]:
    """Train the probe; returns (params, final top-1 on the training set).

    batch_size=None does full-batch steps — exactly the reference's loop
    (one whole-dataset gradient step per "epoch",
    ref: src/run_privacy.py:313-320). The reference evaluates attacker top-1
    on the same embedding set it trained on — the metric is leakage, not
    generalization (ref: :322-337).
    """
    model = FeatureAttacker(num_classes=num_classes)
    k_init, k_shuf = jax.random.split(key)
    params = jax.jit(lambda k: model.init(k, embeddings[:1]))(k_init)["params"]
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    n = embeddings.shape[0]
    if batch_size is None:
        batch_size = n
    steps = max(1, n // batch_size)

    @jax.jit
    def train_step(params, opt_state, z, y):
        def loss_fn(p):
            logits = model.apply({"params": p}, z)
            return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), y))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for epoch in range(epochs):
        k_shuf, k_ep = jax.random.split(k_shuf)
        order = jax.random.permutation(k_ep, n)
        for s in range(steps):
            idx = order[s * batch_size:(s + 1) * batch_size]
            params, opt_state, _ = train_step(params, opt_state,
                                              embeddings[idx], labels[idx])

    logits = jax.jit(lambda p, z: model.apply({"params": p}, z))(params, embeddings)
    top1 = float(jnp.mean((jnp.argmax(logits, axis=1) == labels).astype(jnp.float32)))
    return params, top1
