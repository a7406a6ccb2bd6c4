"""DeviceClipStore (data/device_store.py): on-device gathered batches must be
bit-identical to the host iterate_batches path (shared iter_batch_indices),
for both dataset modes, ragged tails, and under a dp batch sharding."""
import jax
import jax.numpy as jnp
import numpy as np

from ssl_vit_video_analytics_tpu.data.device_store import DeviceClipStore
from ssl_vit_video_analytics_tpu.data.loader import ClipDataset, iterate_batches


def _host_batches(ds, B, **kw):
    return list(iterate_batches(ds, B, **kw))


def _assert_batches_equal(host, dev):
    assert len(host) == len(dev)
    for hb, db in zip(host, dev):
        assert set(hb) == set(db)
        for k in hb:
            np.testing.assert_array_equal(np.asarray(hb[k]), np.asarray(db[k]))


def test_device_store_matches_host_path(synth_data):
    for mode in ("ssl", "supervised"):
        ds = ClipDataset(synth_data["train"], mode=mode, clip_len=4, stride=2,
                         image_size=32, seed=3, verbose=False)
        store = DeviceClipStore(ds, log=lambda *_: None)
        for shuffle, drop_last, epoch in ((True, True, 1), (False, False, 2)):
            kw = dict(shuffle=shuffle, seed=3, epoch=epoch, drop_last=drop_last)
            _assert_batches_equal(
                _host_batches(ds, 3, **kw),
                list(store.epoch_batches(3, **kw)))


def test_device_store_dp_sharding(synth_data):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ssl_vit_video_analytics_tpu.parallel.mesh import make_mesh

    ds = ClipDataset(synth_data["train"], mode="supervised", clip_len=4,
                     stride=2, image_size=32, seed=0, verbose=False)
    mesh = make_mesh({"data": 4})
    dsh = NamedSharding(mesh, P("data"))
    store = DeviceClipStore(ds, sharding=dsh, log=lambda *_: None)
    batches = list(store.epoch_batches(8, shuffle=True, seed=0, epoch=1,
                                       drop_last=True, sharding=dsh))
    assert batches
    for b in batches:
        assert b["clip"].sharding.is_equivalent_to(dsh, b["clip"].ndim)
    _assert_batches_equal(
        _host_batches(ds, 8, shuffle=True, seed=0, epoch=1, drop_last=True),
        batches)


def test_run_dynamic_device_resident_matches_host(synth_data, tmp_path):
    """run_dynamic with dataset.device_resident=true: identical accuracy /
    frame-usage columns to the host path (only timings may differ)."""
    from ssl_vit_video_analytics_tpu.entry import run_dynamic
    from ssl_vit_video_analytics_tpu.utils.io import read_csv_dicts

    def cfg(dev_res, out):
        return {
            "seed": 42,
            "device": {"compute_dtype": "float32"},
            "dataset": {"backend": "packed", "split": synth_data["val"],
                        "num_classes": 4, "clip_len": 4, "stride": 2,
                        "image_size": 32, "device_resident": dev_res},
            "model": {"embed_dim": 32, "finetune_ckpt": None},
            "runtime": {"batch_size": 4, "num_warmup": 0, "num_measure": 1},
            "paths": {"log_dir": str(tmp_path / "logs"), "split_root": ""},
            "output": {"save_dir": str(tmp_path / out), "save_csv": True},
            "dynamic": {"mode": "early_exit", "confidence_thresholds": [0.3],
                        "min_frames": 2, "max_frames": 4, "frame_step": 1},
        }

    host = read_csv_dicts(run_dynamic.run(
        cfg(False, "host"), mode="early_exit", log=lambda *_: None)["csv"])
    dev = read_csv_dicts(run_dynamic.run(
        cfg(True, "dev"), mode="early_exit", log=lambda *_: None)["csv"])
    for col in ("top1", "top5", "avg_frames", "avg_conf"):
        assert host[0][col] == dev[0][col], col


def test_chunked_store_matches_host_path(synth_data):
    """ChunkedDeviceClipStore (shard rotation for >HBM splits): batch order,
    contents, tails and valid masks must be BIT-IDENTICAL to the host path —
    the epoch permutation is the host path's own, cut into shards."""
    from ssl_vit_video_analytics_tpu.data.device_store import ChunkedDeviceClipStore

    for mode in ("ssl", "supervised"):
        ds = ClipDataset(synth_data["train"], mode=mode, clip_len=4, stride=2,
                         image_size=32, seed=3, verbose=False)
        clip_bytes = 4 * 32 * 32 * 3
        # force several shards: room for ~2 batches of 3 per shard
        store = ChunkedDeviceClipStore(ds, shard_bytes=6 * clip_bytes,
                                       batch_size=3, log=lambda *_: None)
        assert store.num_shards >= 2, "fixture too small to exercise rotation"
        for shuffle, drop_last, epoch in ((True, True, 1), (False, False, 2),
                                          (True, False, 3)):
            kw = dict(shuffle=shuffle, seed=3, epoch=epoch, drop_last=drop_last)
            _assert_batches_equal(
                _host_batches(ds, 3, **kw),
                list(store.epoch_batches(3, **kw)))


def test_maybe_device_resident_chunked_gating(synth_data):
    from ssl_vit_video_analytics_tpu.data.device_store import ChunkedDeviceClipStore
    from ssl_vit_video_analytics_tpu.entry import common

    ds = ClipDataset(synth_data["train"], mode="supervised", clip_len=4,
                     stride=2, image_size=32, seed=0, verbose=False)
    cfg = {"dataset": {"device_resident": "chunked",
                       "resident_shard_bytes": 8 * 4 * 32 * 32 * 3},
           "training": {"batch_size": 4}}
    store = common.maybe_device_resident(cfg, ds, log=lambda *_: None)
    assert isinstance(store, ChunkedDeviceClipStore)
    got = list(common.epoch_batches(store, 4, shuffle=True, seed=0, epoch=1))
    _assert_batches_equal(
        _host_batches(ds, 4, shuffle=True, seed=0, epoch=1, drop_last=True),
        got)


def test_maybe_device_resident_gating(synth_data):
    from ssl_vit_video_analytics_tpu.entry import common

    ds = ClipDataset(synth_data["train"], mode="ssl", clip_len=4, stride=2,
                     image_size=32, seed=0, verbose=False)
    # auto on CPU -> passthrough
    assert common.maybe_device_resident({"dataset": {}}, ds) is ds
    # explicit false -> passthrough
    cfg_off = {"dataset": {"device_resident": False}}
    assert common.maybe_device_resident(cfg_off, ds) is ds
    # explicit true -> store, and epoch_batches dispatches to it
    cfg_on = {"dataset": {"device_resident": True}}
    store = common.maybe_device_resident(cfg_on, ds, log=lambda *_: None)
    assert isinstance(store, DeviceClipStore)
    got = list(common.epoch_batches(store, 3, shuffle=False, seed=0, epoch=0))
    _assert_batches_equal(
        _host_batches(ds, 3, shuffle=False, seed=0, epoch=0, drop_last=True),
        got)
