"""Data layer tests: TFRecord codec, datasets, loader, augmentations."""
import os

import jax.numpy as jnp

import cv2
import numpy as np
import pytest

from vit_unet_tpu.data import tfrecord as tfr
from vit_unet_tpu.data.augment import (Compose, HorizontalFlip, Resize,
                                       ShiftScaleRotate, train_transforms)
from vit_unet_tpu.data.datasets import (DeblurringDataset, DenoisingDataset,
                                        kfold_split)
from vit_unet_tpu.data.loader import DataLoader, prefetch_to_device, tfrecord_dataset


def test_crc32c_vectors():
    # standard Castagnoli test vectors
    assert tfr._crc32c_py(b"123456789") == 0xE3069283
    assert tfr._crc32c_py(b"") == 0
    assert tfr.masked_crc(b"") == (0 + 0xA282EAD8) & 0xFFFFFFFF


def test_example_roundtrip():
    feats = {"x": np.arange(12, dtype=np.uint8).tobytes(), "y": b"hi",
             "f": np.asarray([1.5, -2.25], np.float32), "i": [3, -4, 5]}
    dec = tfr.decode_example(tfr.encode_example(feats))
    assert dec["x"][0] == feats["x"]
    assert dec["y"][0] == b"hi"
    np.testing.assert_array_equal(dec["f"], [1.5, -2.25])
    np.testing.assert_array_equal(dec["i"], [3, -4, 5])


def test_record_crc_detects_corruption(tmp_path):
    path = str(tmp_path / "a.tfrec")
    with tfr.TFRecordWriter(path) as w:
        w.write_example({"x": b"payload"})
    blob = bytearray(open(path, "rb").read())
    blob[-6] ^= 0xFF  # flip a payload byte
    open(path, "wb").write(bytes(blob))
    with pytest.raises(IOError):
        list(tfr.read_examples(path))


def test_sharded_convert_and_count(tmp_path):
    items = [{"x": bytes([i]) * 1000, "y": bytes([i])} for i in range(30)]
    paths = tfr.convert(items, str(tmp_path), "ssid_fold_0_",
                        lambda it: it, max_mb=1)
    assert tfr.count_data_items(paths) == 30
    back = [ex for p in paths for ex in tfr.read_examples(p)]
    assert len(back) == 30


def test_codec_remote_and_filelike_sources(tmp_path):
    """GCS-style streaming without TensorFlow: the codec accepts fsspec URLs
    (exercised via the in-memory filesystem, same code path as ``gs://``) and
    open file-like objects (``TPUs_in_Colab.ipynb`` cell 21 workflow)."""
    import io

    pytest.importorskip("fsspec")
    items = [{"x": bytes([i]) * 500, "y": bytes([i])} for i in range(10)]

    # remote sharded write + remote read (memory:// = mocked bucket)
    paths = tfr.convert(items, "memory://bucket/tfrec", "ssid_fold_0_",
                        lambda it: it, max_mb=1)
    assert all(p.startswith("memory://") for p in paths)
    assert tfr.count_data_items(paths) == 10
    back = [ex for p in paths for ex in tfr.read_examples(p)]
    assert len(back) == 10
    assert back[3]["x"][0] == bytes([3]) * 500

    # file-like roundtrip (no filesystem at all)
    buf = io.BytesIO()
    with tfr.TFRecordWriter(buf) as w:
        for it in items:
            w.write_example(it)
    buf.seek(0)
    assert len(list(tfr.read_examples(buf))) == 10
    assert not buf.closed   # caller-owned handles stay open


def make_pairs(root, n=8, size=48):
    rng = np.random.default_rng(0)
    for sub in ("clean", "noisy"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    for i in range(n):
        clean = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        noisy = np.clip(clean.astype(int) +
                        rng.integers(-20, 20, clean.shape), 0, 255).astype(np.uint8)
        cv2.imwrite(os.path.join(root, "clean", f"{i:03d}.png"), clean)
        cv2.imwrite(os.path.join(root, "noisy", f"{i:03d}.png"), noisy)


def test_denoising_dataset_and_loader(tmp_path):
    make_pairs(str(tmp_path))
    ds = DenoisingDataset.from_folder(str(tmp_path), im_size=32)
    assert len(ds) == 8
    s = ds[0]
    assert s["x"].shape == (3, 32, 32) and s["x"].dtype == np.float32
    assert 0.0 <= s["x"].min() and s["x"].max() <= 1.0

    dl = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2)
    assert len(dl) == 2
    batches = list(dl)
    assert len(batches) == 2
    assert batches[0]["x"].shape == (4, 3, 32, 32)

    # drop_remainder
    dl3 = DataLoader(ds, batch_size=3, shuffle=False)
    assert len(dl3) == 2
    assert all(b["x"].shape[0] == 3 for b in dl3)

    # device prefetch
    got = list(prefetch_to_device(iter(DataLoader(ds, 4))))
    assert len(got) == 2 and got[0]["x"].shape == (4, 3, 32, 32)


def test_dataset_pairing_error(tmp_path):
    make_pairs(str(tmp_path), n=4)
    os.remove(os.path.join(str(tmp_path), "noisy", "003.png"))
    with pytest.raises(ValueError):
        DenoisingDataset.from_folder(str(tmp_path))


def test_tfrecord_dataset_pipeline(tmp_path):
    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 255, (16, 16, 3), dtype=np.uint8) for _ in range(6)]
    items = [{"x": im.tobytes(), "y": im.tobytes()} for im in imgs]
    paths = tfr.convert(items, str(tmp_path), "fold_0_", lambda it: it)
    ds = tfrecord_dataset(paths, shape=(16, 16, 3))
    assert len(ds) == 6
    s = ds[2]
    np.testing.assert_allclose(
        s["x"], imgs[2].astype(np.float32).transpose(2, 0, 1) / 255.0)


def test_augmentations_paired(rng):
    img = (np.mgrid[0:32, 0:32][0] * 8).astype(np.uint8)
    img = np.stack([img] * 3, axis=-1)
    tr = Compose([Resize(24, 24), HorizontalFlip(p=1.0),
                  ShiftScaleRotate(p=1.0)])
    gen = np.random.default_rng(0)
    a, b = tr(gen, img.copy(), img.copy())
    assert a.shape == (24, 24, 3)
    np.testing.assert_array_equal(a, b)  # identical geometry on both


def test_kfold_split():
    folds = list(kfold_split(50, 5))
    assert len(folds) == 5
    for train, val in folds:
        assert len(train) + len(val) == 50
        assert not set(train) & set(val)
    all_val = np.concatenate([v for _, v in folds])
    assert sorted(all_val.tolist()) == list(range(50))


def test_tfdata_pipeline_roundtrip(tmp_path):
    """tf.data streaming path parses our own TFRecord shards identically to
    the in-memory reader (ViT_UNet_TF_TPU.ipynb cell 16 semantics)."""
    pytest.importorskip("tensorflow")
    from vit_unet_tpu.data.loader import tfdata_pipeline
    from vit_unet_tpu.data.tfrecord import TFRecordWriter

    rng = np.random.default_rng(0)
    shape = (8, 8, 3)
    path = str(tmp_path / "pairs-4.tfrec")
    imgs = []
    with TFRecordWriter(path) as w:
        for _ in range(4):
            x = rng.integers(0, 255, size=shape, dtype=np.uint8)
            y = rng.integers(0, 255, size=shape, dtype=np.uint8)
            imgs.append((x, y))
            w.write_example({"x": x.tobytes(), "y": y.tobytes()})

    batches = list(tfdata_pipeline([path], shape, batch_size=2))
    assert len(batches) == 2
    assert batches[0]["x"].shape == (2, 3, 8, 8)
    np.testing.assert_allclose(
        batches[0]["x"][0],
        imgs[0][0].astype(np.float32).transpose(2, 0, 1) / 255.0)
    np.testing.assert_allclose(
        batches[1]["y"][1],
        imgs[3][1].astype(np.float32).transpose(2, 0, 1) / 255.0)


def test_prefetch_propagates_producer_errors():
    def bad_iter():
        yield {"x": np.ones(2)}
        raise IOError("corrupt shard")

    it = prefetch_to_device(bad_iter())
    next(it)
    with pytest.raises(IOError, match="corrupt shard"):
        next(it)


def test_dataloader_shards_have_equal_length():
    class Ds:
        def __len__(self):
            return 6
        def __getitem__(self, i):
            return {"x": np.full(2, i)}

    lengths = []
    for shard in range(4):
        dl = DataLoader(Ds(), batch_size=1, shard_id=shard, num_shards=4)
        lengths.append(len(list(dl)))
    assert lengths == [1, 1, 1, 1]   # truncated to common length


def test_native_rejects_huge_length_field(tmp_path):
    _native = pytest.importorskip("vit_unet_tpu.data._native")
    import struct
    # length field near 2^64 must not wrap the bounds check
    raw = struct.pack("<Q", 2**64 - 8) + b"\x00" * 24
    with pytest.raises(IOError, match="truncated"):
        _native.scan_records(raw)


def test_segmentation_mask_stays_binary_after_transforms(monkeypatch, tmp_path):
    from vit_unet_tpu.data import datasets as D

    ds = object.__new__(D.SegmentationDataset)   # bypass pydicom import
    ds.dicom_paths = ["fake"]
    ds.label_paths = ["fake"]
    ds.slices = [0]
    ds.im_size = 16
    from vit_unet_tpu.data.augment import ShiftScaleRotate
    ds.transforms = ShiftScaleRotate(p=1.0)
    ds.channels_first = True
    ds.rng = np.random.default_rng(0)

    img = np.random.default_rng(1).uniform(size=(16, 16)).astype(np.float32)
    mask = (np.random.default_rng(2).uniform(size=(16, 16)) > 0.5
            ).astype(np.float32)

    class FakeDicom:
        pixel_array = img

    class FakeNii:
        dataobj = np.repeat(mask[..., None], 1, axis=-1)

    import sys, types
    fake_pydicom = types.SimpleNamespace(dcmread=lambda p: FakeDicom())
    fake_nib = types.SimpleNamespace(load=lambda p: FakeNii())
    monkeypatch.setitem(sys.modules, "pydicom", fake_pydicom)
    monkeypatch.setitem(sys.modules, "nibabel", fake_nib)

    out = ds[0]
    vals = np.unique(out["y"])
    assert set(vals.tolist()) <= {0.0, 1.0}


def test_codec_numpy_scalars_and_empty_lists():
    """encode_feature accepts numpy scalars; decode handles empty numeric
    lists (both verified against TF's own parser when available)."""
    payload = tfr.encode_example({
        "label": np.int64(5),
        "score": np.float32(0.25),
        "empty_f": np.asarray([], np.float32),
        "empty_i": np.asarray([], np.int64),
    })
    decoded = tfr.decode_example(payload)
    assert decoded["label"].tolist() == [5]
    np.testing.assert_allclose(decoded["score"], [0.25])
    assert len(decoded["empty_f"]) == 0
    assert len(decoded["empty_i"]) == 0

    try:
        import tensorflow as tf
    except ImportError:
        return
    ex = tf.train.Example.FromString(payload)
    assert ex.features.feature["label"].int64_list.value[:] == [5]
    # and the reverse: TF-written empty float list decodes cleanly
    ex2 = tf.train.Example(features=tf.train.Features(feature={
        "e": tf.train.Feature(float_list=tf.train.FloatList(value=[])),
        "x": tf.train.Feature(bytes_list=tf.train.BytesList(value=[b"a"])),
    }))
    out = tfr.decode_example(ex2.SerializeToString())
    assert out["x"] == [b"a"]
    assert len(out["e"]) == 0


def test_python_reader_raises_ioerror_on_truncation(tmp_path, monkeypatch):
    # force the pure-python path
    monkeypatch.setattr(tfr, "_NATIVE", None)
    monkeypatch.setattr(tfr, "_NATIVE_CHECKED", True)
    path = str(tmp_path / "t.tfrec")
    with tfr.TFRecordWriter(path) as w:
        w.write(b"hello world payload")
    raw = open(path, "rb").read()
    open(path, "wb").write(raw[:-6])          # chop the tail
    with pytest.raises(IOError, match="truncated"):
        list(tfr.read_records(path))


def test_tfrecord_stream_matches_materialised(tmp_path):
    """TFRecordStream (streaming, bounded-RAM) yields exactly the content
    tfrecord_dataset materialises, in order when unshuffled; the streaming
    record reader agrees with the slurping one byte-for-byte."""
    from vit_unet_tpu.data.loader import TFRecordStream

    rng = np.random.default_rng(7)
    imgs = [rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
            for _ in range(10)]
    items = [{"x": im.tobytes(), "y": (255 - im).tobytes()} for im in imgs]
    paths = tfr.convert(items, str(tmp_path), "fold_0_", lambda it: it)

    # record-level parity: streaming reader == whole-file reader
    for p in paths:
        a = list(tfr.read_records(p))
        b = list(tfr.read_records_streaming(p))
        assert a == b

    ds = tfrecord_dataset(paths, shape=(8, 8, 3))
    stream = TFRecordStream(paths, shape=(8, 8, 3), batch_size=4)
    got = [b for b in stream]
    assert len(got) == 2  # 10 records, drop_remainder
    flat_stream = np.concatenate([b["x"] for b in got])
    flat_ds = np.stack([ds[i]["x"] for i in range(8)])
    np.testing.assert_allclose(flat_stream, flat_ds)

    # shuffled epochs: same multiset, different order, re-iterable
    sh = TFRecordStream(paths, shape=(8, 8, 3), batch_size=5,
                        shuffle_buffer=4, seed=3)
    e1 = np.concatenate([b["x"] for b in sh])
    e2 = np.concatenate([b["x"] for b in sh])
    assert e1.shape == e2.shape == (10, 3, 8, 8)
    np.testing.assert_allclose(
        np.sort(e1.reshape(10, -1).sum(1)), np.sort(e2.reshape(10, -1).sum(1)))
    assert not np.allclose(e1, e2)  # order differs across epochs


def test_tfrecord_streaming_reader_detects_corruption(tmp_path):
    path = str(tmp_path / "x.tfrec")
    with tfr.TFRecordWriter(path) as w:
        for _ in range(3):
            w.write_example({"x": b"abc", "y": b"def"})
    raw = bytearray(open(path, "rb").read())
    raw[len(raw) // 2] ^= 0xFF
    open(path, "wb").write(bytes(raw))
    with pytest.raises(IOError):
        list(tfr.read_records_streaming(path))
    # truncation mid-record
    open(path, "wb").write(bytes(raw[:-6]))
    with pytest.raises(IOError, match="truncated"):
        list(tfr.read_records_streaming(path, verify_crc=False))


def test_tfrecord_stream_raw_device_normalize(tmp_path):
    """host_convert=False + device_normalize: raw uint8 NHWC batches whose
    on-device conversion equals the host-convert path to 1 ulp (XLA
    canonicalises /255 to a reciprocal multiply, so the last bit can
    differ from numpy's divide) — the low-H2D input recipe
    tools/datafeed_bench.py uses."""
    from vit_unet_tpu.data.loader import TFRecordStream, device_normalize

    rng = np.random.default_rng(9)
    imgs = [rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
            for _ in range(8)]
    items = [{"x": im.tobytes(), "y": (255 - im).tobytes()} for im in imgs]
    paths = tfr.convert(items, str(tmp_path), "fold_0_", lambda it: it)

    host = list(TFRecordStream(paths, shape=(8, 8, 3), batch_size=4))
    raw_stream = TFRecordStream(paths, shape=(8, 8, 3), batch_size=4,
                                host_convert=False)
    conv = device_normalize()
    dev = list(prefetch_to_device(iter(raw_stream), transform=conv))
    assert len(host) == len(dev) == 2
    for hb, db in zip(host, dev):
        for k in ("x", "y"):
            assert db[k].dtype == jnp.float32
            np.testing.assert_allclose(np.asarray(db[k]), hb[k],
                                       rtol=0, atol=1.2e-7)


def test_device_resident_data_matches_host_pipeline():
    """DeviceResidentData: staged-uint8 + on-device gather/normalize batches
    equal the host-converted content (1-ulp /255 tolerance), full batches
    only, per-epoch reshuffle reorders but preserves the multiset."""
    from vit_unet_tpu.data.loader import DeviceResidentData

    rng = np.random.default_rng(3)
    x = rng.integers(0, 255, (10, 8, 8, 3), dtype=np.uint8)
    y = 255 - x
    ds = DeviceResidentData(x, y, batch_size=4, shuffle=False)
    got = list(ds)
    assert len(ds) == len(got) == 2          # drop_remainder
    ref = x[:8].astype(np.float32).transpose(0, 3, 1, 2) / 255.0
    np.testing.assert_allclose(
        np.concatenate([np.asarray(b["x"]) for b in got]), ref,
        rtol=0, atol=1.2e-7)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(b["y"]) for b in got]),
        (255 - x)[:8].astype(np.float32).transpose(0, 3, 1, 2) / 255.0,
        rtol=0, atol=1.2e-7)

    sh = DeviceResidentData(x, y, batch_size=5, seed=1)
    e1 = np.concatenate([np.asarray(b["x"]) for b in sh])
    e2 = np.concatenate([np.asarray(b["x"]) for b in sh])
    assert e1.shape == e2.shape == (10, 3, 8, 8)
    np.testing.assert_allclose(np.sort(e1.reshape(10, -1).sum(1)),
                               np.sort(e2.reshape(10, -1).sum(1)), atol=1e-5)
    assert not np.allclose(e1, e2)
