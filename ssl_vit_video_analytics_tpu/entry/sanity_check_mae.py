"""Pipeline-C smoke test (reference: src/scripts/sanity_check_mae.py).

Loads one real clip from the config's split, constructs TinyViTMAE with the
strict kwargs, builds a tube mask, runs forward + stats + one backward step,
prints [SANITY] PASSED. The reference version doubles as the API contract
for pipeline C (its train_mae.py crashed with wrong kwargs; SURVEY.md §2.10.1).

Usage:
  python -m ssl_vit_video_analytics_tpu.entry.sanity_check_mae \
      --config configs/mae_train.yaml
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..data.masking import make_token_mask
from ..ops.preprocess import normalize_clip
from ..train.losses import build_mae_loss, reconstruction_error_stats
from . import common
from .train_mae import build_model


def main():
    p = common.make_parser("MAE pipeline-C sanity check")
    args = p.parse_args()
    cfg = common.load_merged_config(args, "configs/mae_train.yaml")
    dtype = common.compute_dtype_from(cfg)

    ds = common.dataset_from_cfg(cfg, common.split_path(cfg, cfg["dataset"]["train_split"]),
                                 "ssl")
    clip_u8 = ds.get_clip(0)[None]
    T = clip_u8.shape[1]
    mae = cfg["mae"]
    P = int(mae.get("stage4_pool", 3)) ** 2

    model = build_model(cfg, dtype)
    clip = normalize_clip(jnp.asarray(clip_u8), dtype=dtype)
    mask = make_token_mask(jax.random.key(0), 1, T, P,
                           float(mae.get("mask_ratio", 0.8)),
                           str(mae.get("mask_mode", "tube")))
    variables = jax.jit(lambda k: model.init(k, clip, mask))(jax.random.key(1))
    print(f"[SANITY] clip {clip.shape}, mask {mask.shape} "
          f"({int(mask.sum())} masked of {mask.size})")

    rec, target = jax.jit(lambda v, c, m: model.apply(v, c, m))(variables, clip, mask)
    stats = {k: float(v) for k, v in
             reconstruction_error_stats(rec, target, mask).items()}
    print(f"[SANITY] forward ok: rec {rec.shape}, stats {stats}")

    loss_fn = build_mae_loss("l2")

    def loss(params):
        r, t = model.apply({**variables, "params": params}, clip, mask)
        return loss_fn(r, t, mask)

    grads = jax.jit(jax.grad(loss))(variables["params"])
    gnorm = float(jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                               for g in jax.tree.leaves(grads))))
    assert np.isfinite(gnorm), "non-finite gradients"
    print(f"[SANITY] backward ok: grad_norm={gnorm:.4f}")
    print("[SANITY] PASSED")


if __name__ == "__main__":
    main()
