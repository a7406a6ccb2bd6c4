"""Functional parity of the torch->flax checkpoint importer.

Builds the REFERENCE's own torch MobileViT backbone (imported at runtime
from /root/reference — never copied), gives it non-trivial BN running
statistics, converts its state_dict with tools/import_torch_checkpoint, and
checks that this repo's VideoClassifier produces the same embeddings and
logits on the same clip. Skipped when the reference checkout is absent.
"""
import os
import sys

import numpy as np
import pytest

REF = "/root/reference/src"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not present")


def test_reference_checkpoint_imports_functionally():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REF)
    try:
        from models.mobilevit import build_mobilevit_s as ref_build
    finally:
        sys.path.remove(REF)

    class RefClassifier(torch.nn.Module):
        # same attribute names as ref src/train_finetune.py:19-27
        def __init__(self):
            super().__init__()
            self.backbone = ref_build(embed_dim=64)
            self.classifier = torch.nn.Linear(64, 5)

    torch.manual_seed(0)
    ref = RefClassifier()
    # populate BN running stats so the mapping of running_mean/var is tested
    ref.train()
    with torch.no_grad():
        for _ in range(2):
            ref.backbone(torch.randn(4, 3, 64, 64))
    ref.eval()

    B, T, S = 2, 3, 64
    clip = torch.rand(B, 3, T, S, S)
    with torch.no_grad():
        embs = []
        for t in range(T):
            _, e = ref.backbone(clip[:, :, t])
            embs.append(e)
        ref_emb = torch.stack(embs, 1).mean(1)
        ref_logits = ref.classifier(ref_emb)

    from tools.import_torch_checkpoint import convert_classifier_state_dict
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = convert_classifier_state_dict(sd)

    import jax.numpy as jnp

    from ssl_vit_video_analytics_tpu.train import finetune_engine as eng

    model = eng.build_model(5, 64)
    clip_f = jnp.asarray(clip.permute(0, 2, 3, 4, 1).numpy())  # NCTHW->NTHWC
    variables = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
    emb = model.apply(variables, clip_f, method="video_embedding")
    logits = model.apply(variables, clip_f)

    re, fe = ref_emb.numpy(), np.asarray(emb)
    cos = (re * fe).sum() / (np.linalg.norm(re) * np.linalg.norm(fe))
    # exact-vs-approximate GELU keeps outputs within ~1e-3
    assert cos > 0.999, f"embedding cosine {cos}"
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(),
                               atol=5e-2, rtol=5e-2)
    assert (np.argmax(np.asarray(logits), 1)
            == np.argmax(ref_logits.numpy(), 1)).all()
