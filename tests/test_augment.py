"""On-device finetune augmentation (ops/augment.py): shape/dtype invariance,
PRNG determinism, temporal coherence of shifts, config gating, and the
end-to-end knob in the finetune train step."""
import jax
import jax.numpy as jnp
import numpy as np

from ssl_vit_video_analytics_tpu.ops.augment import augment_clip, augment_from_cfg


def _clip(B=3, T=4, S=16):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((B, T, S, S, 3)), jnp.float32)


def test_shape_dtype_and_determinism():
    x = _clip()
    k = jax.random.key(7)
    a = augment_clip(k, x)
    b = augment_clip(k, x)
    assert a.shape == x.shape and a.dtype == x.dtype
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = augment_clip(jax.random.key(8), x)
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 0


def test_translation_is_temporally_coherent():
    """The same (dy, dx) must apply to every frame of a sample: a static clip
    stays static after augmentation (photometrics are also per-clip)."""
    x = jnp.tile(_clip(B=2, T=1), (1, 5, 1, 1, 1))
    out = np.asarray(augment_clip(jax.random.key(3), x))
    for t in range(1, 5):
        np.testing.assert_array_equal(out[:, t], out[:, 0])


def test_identity_when_disabled():
    x = _clip()
    out = augment_clip(jax.random.key(0), x, max_shift=0, brightness=0.0,
                       contrast=0.0, hflip=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_cfg_gating():
    assert augment_from_cfg({}) is None
    assert augment_from_cfg({"augment": False}) is None
    fn = augment_from_cfg({"augment": True})
    x = _clip()
    assert fn(jax.random.key(0), x).shape == x.shape
    fn2 = augment_from_cfg({"augment": {"max_shift": 2, "brightness": 0.0,
                                        "contrast": 0.0}})
    assert fn2(jax.random.key(0), x).shape == x.shape


def test_finetune_step_with_augment():
    """make_train_step(augment=...) compiles and trains (loss finite)."""
    import optax

    from ssl_vit_video_analytics_tpu.train import finetune_engine as eng
    from ssl_vit_video_analytics_tpu.train.state import create_train_state

    model = eng.build_model(num_classes=3, embed_dim=32)
    variables = eng.init_model(model, jax.random.key(0), (2, 2, 32, 32, 3))
    tx = optax.adam(1e-3)
    state = create_train_state(variables["params"], tx,
                               batch_stats=variables.get("batch_stats"))
    step = eng.make_train_step(
        model, tx, augment=augment_from_cfg({"augment": {"max_shift": 4}}))
    batch = {"clip": jnp.zeros((2, 2, 32, 32, 3), jnp.uint8),
             "label": jnp.array([0, 1])}
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
