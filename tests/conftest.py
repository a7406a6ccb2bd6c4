"""Test configuration: force an 8-device virtual CPU mesh.

This environment's sitecustomize imports jax and registers the axon TPU
plugin in EVERY python process, so env vars set here are too late — instead
we flip jax.config after import but before the backend initializes (backends
are created lazily on first device use).

Known flake: the shard_map federated tests can die with a bare
"Fatal Python error:" when another process is concurrently attached to the
axon tunnel. They run process-isolated with one crash-retry
(tests/test_federated.py _run_isolated) so a contended suite run stays
green; a genuine failure still fails on the first child run.
"""
import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# XLA_FLAGS is read by the CPU backend at initialization, which has not
# happened yet at conftest-import time.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# single-core test host: cheap compiles beat optimized ones
if "xla_backend_optimization_level" not in flags:
    flags += " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402

jax.config.update("jax_platform_name", "cpu")
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert jax.device_count() == 8

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synth_data(tmp_path_factory):
    """Tiny synthetic frame dataset shared across tests."""
    from ssl_vit_video_analytics_tpu.data import make_synthetic_dataset
    root = tmp_path_factory.mktemp("synthdata")
    return make_synthetic_dataset(str(root), num_classes=4, videos_per_class=3,
                                  num_frames=20, image_size=32, seed=0)
