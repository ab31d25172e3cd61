"""Native (C++) data-path extension: equivalence with the pure-Python codec.

Skipped when the extension is not built (``python setup.py build_ext
--inplace``); CI should build it first.
"""
from __future__ import annotations

import struct

import numpy as np
import pytest

from vit_unet_tpu.data import tfrecord as tfr

_native = pytest.importorskip("vit_unet_tpu.data._native")


def test_crc32c_matches_python():
    rng = np.random.default_rng(0)
    for n in (0, 1, 7, 8, 9, 63, 64, 1000, 4096):
        data = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
        assert _native.crc32c(data) == tfr._crc32c_py(data), n


def test_crc32c_known_vector():
    # RFC 3720 test vector: 32 bytes of zeros -> 0x8A9136AA
    assert _native.crc32c(b"\x00" * 32) == 0x8A9136AA
    # "123456789" -> 0xE3069283
    assert _native.crc32c(b"123456789") == 0xE3069283


def test_masked_crc_matches_python():
    data = b"tfrecord framing"
    assert _native.masked_crc(data) == tfr.masked_crc(data)


def test_scan_and_read_records_roundtrip(tmp_path):
    path = str(tmp_path / "shard.tfrec")
    payloads = [bytes([i]) * (i * 17 + 1) for i in range(10)]
    with tfr.TFRecordWriter(path) as w:
        for p in payloads:
            w.write(p)
    data = open(path, "rb").read()

    spans = _native.scan_records(data)
    assert len(spans) == len(payloads)
    for (off, length), p in zip(spans, payloads):
        assert data[off:off + length] == p

    assert _native.read_records(data) == payloads
    # and through the public reader (which routes to the native path)
    assert list(tfr.read_records(path)) == payloads


def test_corruption_detected(tmp_path):
    path = str(tmp_path / "bad.tfrec")
    with tfr.TFRecordWriter(path) as w:
        w.write(b"payload-one")
        w.write(b"payload-two")
    raw = bytearray(open(path, "rb").read())
    raw[14] ^= 0xFF                       # flip a payload byte of record 0
    with pytest.raises(IOError, match="corrupt record payload"):
        _native.read_records(bytes(raw))
    # header corruption
    raw2 = bytearray(open(path, "rb").read())
    raw2[0] ^= 0xFF                       # length byte -> truncated/corrupt
    with pytest.raises(IOError):
        _native.read_records(bytes(raw2))
    # verify_crc=False skips payload checks
    out = _native.read_records(bytes(raw), verify_crc=False)
    assert len(out) == 2


def test_truncated_tail_detected():
    payload = b"x" * 20
    header = struct.pack("<Q", len(payload))
    rec = (header + struct.pack("<I", tfr.masked_crc(header)) + payload
           + struct.pack("<I", tfr.masked_crc(payload)))
    with pytest.raises(IOError, match="truncated|trailing"):
        _native.scan_records(rec[:-6])


def test_examples_through_native_reader(tmp_path):
    path = str(tmp_path / "ex.tfrec")
    with tfr.TFRecordWriter(path) as w:
        w.write_example({"x": b"abc", "y": b"def"})
        w.write_example({"x": b"ghi", "y": b"jkl"})
    exs = list(tfr.read_examples(path))
    assert [e["x"][0] for e in exs] == [b"abc", b"ghi"]
    assert [e["y"][0] for e in exs] == [b"def", b"jkl"]
