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


def test_reference_tinyvit_imports_functionally():
    """forward_stage3 parity: the reference's own torch TinyViT vs this
    repo's TinyViT with converted weights on the same frames."""
    torch = pytest.importorskip("torch")
    # the reference imports timm (absent here) only for DropPath /
    # trunc_normal_ — provide minimal stand-ins
    import types

    timm = types.ModuleType("timm")
    layers = types.ModuleType("timm.layers")

    class _DropPath(torch.nn.Module):
        def __init__(self, p=0.0):
            super().__init__()

        def forward(self, x):
            return x

    layers.DropPath = _DropPath
    layers.trunc_normal_ = torch.nn.init.trunc_normal_
    timm.layers = layers
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.layers", layers)

    sys.path.insert(0, REF)
    try:
        from models.tiny_vit import tiny_vit_21m_variant as ref_build
    finally:
        sys.path.remove(REF)

    torch.manual_seed(0)
    ref = ref_build(use_checkpoint=False)
    ref.train()
    with torch.no_grad():
        for _ in range(2):
            ref.forward_stage3(torch.randn(2, 3, 112, 112))
    ref.eval()

    x = torch.rand(2, 3, 112, 112)
    with torch.no_grad():
        ref_out = ref.forward_stage3(x)  # [B, 384, 14, 14]

    from tools.import_torch_checkpoint import convert_tinyvit_state_dict
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = convert_tinyvit_state_dict(sd)

    import jax.numpy as jnp

    from ssl_vit_video_analytics_tpu.models.tiny_vit import tiny_vit_21m_variant

    model = tiny_vit_21m_variant(use_checkpoint=False)
    xf = jnp.asarray(x.permute(0, 2, 3, 1).numpy())  # NCHW -> NHWC
    out = model.apply(variables, xf, method="forward_stage3")  # [B,14,14,384]

    ro = ref_out.permute(0, 2, 3, 1).numpy()
    fo = np.asarray(out)
    cos = (ro * fo).sum() / (np.linalg.norm(ro) * np.linalg.norm(fo))
    assert cos > 0.999, f"stage3 feature cosine {cos}"
    np.testing.assert_allclose(fo, ro, atol=5e-2, rtol=5e-2)
