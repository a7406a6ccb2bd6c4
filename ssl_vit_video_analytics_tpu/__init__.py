"""ssl_vit_video_analytics_tpu — TPU-native self-supervised video analytics framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
lzc452/SSL-VIT-VIDEO-ANALYTICS (reference: /root/reference):

- Lightweight CNN/Transformer hybrid video encoders (MobileViT-S, TinyViT-21M variant)
- Three SSL pretraining pipelines (EMA teacher-student + VICReg + temporal-order
  prediction; pixel-space VideoMAE; feature-space token MAE)
- Supervised action-recognition finetuning (4 modes incl. two-stage)
- Dynamic inference (early-exit / frame-gating / hybrid) latency-accuracy frontier
- Three privacy layers: visual face anonymization, feature perturbation
  z' = z + N(0, sigma^2 I), and FedAvg federated learning
- FedAvg as a *real* parallel program: clients sharded over a device mesh with
  weighted all-reduce aggregation over ICI (the reference simulates it
  sequentially in one process, src/run_federated.py).

Everything device-side is functional JAX under jit: static shapes, lax control
flow, bf16 matmuls on the MXU, Pallas kernels for the attention hot path.
"""

__version__ = "0.1.0"

# --- CPU-forcing that works even when the TPU tunnel is unreachable --------
# This environment's sitecustomize registers the axon TPU PJRT plugin in
# every python process and monkeypatches backend resolution, so
# JAX_PLATFORMS=cpu in the *environment* is not honored: the first
# jax.devices() still initializes the axon client, which BLOCKS forever if
# the tunnel is down. The tests' conftest works around this by flipping
# jax.config post-import; do the same here for CLI/entry runs so
# `JAX_PLATFORM_NAME=cpu python -m ssl_vit_video_analytics_tpu.entry.*` is
# usable offline. Backends initialize lazily on first device use, so this
# is safe as long as the package is imported before any jax device call.
import os as _os

if _os.environ.get("JAX_PLATFORM_NAME", "").lower() == "cpu":
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass  # backend already initialized (e.g. under pytest conftest)
