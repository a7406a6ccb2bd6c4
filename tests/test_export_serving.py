"""AOT serving export (tools/export_serving.py): round-trip a tiny
classifier through jax.export serialize/deserialize and pin equality with
the live model at two different batch sizes (the batch dim is symbolic)."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.export_serving import export_classifier  # noqa: E402


def test_export_roundtrip_matches_live_model(tmp_path):
    cfg = {"dataset": {"clip_len": 2, "image_size": 32, "num_classes": 5},
           "model": {"embed_dim": 32, "backbone": "mobilevit_s",
                     "finetune_ckpt": None}}
    blob = export_classifier(cfg, log=lambda *a: None)
    path = tmp_path / "clf.jaxexport"
    path.write_bytes(blob)

    exp = jax.export.deserialize(path.read_bytes())
    from ssl_vit_video_analytics_tpu.train import finetune_engine as eng
    model = eng.build_model(5, 32)
    variables = eng.init_model(model, jax.random.key(0), (1, 2, 32, 32, 3))

    rng = np.random.default_rng(0)
    for B in (2, 4):  # symbolic batch: one artifact, multiple batch sizes
        clip = rng.standard_normal((B, 2, 32, 32, 3)).astype(np.float32)
        served = np.asarray(exp.call(clip))
        live = np.asarray(model.apply(variables, jnp.asarray(clip),
                                      train=False))
        assert served.shape == (B, 5)
        np.testing.assert_allclose(served, live, rtol=1e-5, atol=1e-5)
