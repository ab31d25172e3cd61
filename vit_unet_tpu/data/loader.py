"""Input pipeline: dataset -> shuffled, batched, device-prefetched batches.

TPU-native replacement for the reference's two pipelines — torch
``DataLoader(num_workers=2)`` (``run_denoising.py:60-75``) and the ``tf.data``
cache/repeat/shuffle/batch(drop_remainder)/prefetch chain
(``ViT_UNet_TF_TPU.ipynb`` cell 16) — without either framework:

* a thread pool decodes/augments samples ahead of consumption,
* batches are always full (``drop_remainder`` — static shapes for XLA),
* per-host sharding for multi-host data parallelism,
* ``prefetch_to_device`` keeps H2D copies off the step's critical path.

Also provides ``tfrecord_dataset`` to stream the reference's TFRecord shards
(Convert_tfrecords.ipynb schema: x/y raw-byte features).
"""
from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional, Sequence

import numpy as np

import jax

from vit_unet_tpu.data import tfrecord as tfr


class DataLoader:
    """Iterable of {'x','y'} numpy batches from an indexable dataset."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_remainder: bool = True, num_workers: int = 2,
                 seed: int = 0, shard_id: int = 0, num_shards: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_remainder = drop_remainder
        self.num_workers = max(0, num_workers)
        self.seed = seed
        self.shard_id = shard_id
        self.num_shards = num_shards
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self._indices())
        if self.drop_remainder:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            idx = rng.permutation(idx)
        # per-host shard (each host feeds its own slice of the global batch).
        # Truncate to a common per-shard length: unequal shard sizes would
        # give hosts different step counts and hang the SPMD collectives.
        per_shard = len(idx) // self.num_shards
        return idx[self.shard_id::self.num_shards][:per_shard]

    def __iter__(self) -> Iterator[dict]:
        indices = self._indices()
        self._epoch += 1
        bs = self.batch_size

        def fetch(i: int) -> dict:
            return self.dataset[int(i)]

        if self.num_workers == 0:
            samples: Iterable[dict] = (fetch(i) for i in indices)
        else:
            samples = self._windowed_map(fetch, indices)

        batch: list[dict] = []
        for s in samples:
            batch.append(s)
            if len(batch) == bs:
                yield _collate(batch)
                batch = []
        if batch and not self.drop_remainder:
            yield _collate(batch)

    def _windowed_map(self, fn, items) -> Iterator[dict]:
        """Thread-pool map with a bounded in-flight window: decodes stay a
        couple of batches ahead of consumption without materialising the
        whole epoch (Executor.map submits everything up front)."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        window = max(2 * self.batch_size, 4 * self.num_workers)
        with ThreadPoolExecutor(self.num_workers) as pool:
            pending: deque = deque()
            it = iter(items)
            for item in it:
                pending.append(pool.submit(fn, item))
                if len(pending) >= window:
                    yield pending.popleft().result()
            while pending:
                yield pending.popleft().result()


def _collate(samples: Sequence[dict]) -> dict:
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


def tfrecord_dataset(paths: Sequence[str], shape: tuple, dtype=np.uint8,
                     normalize: bool = True, channels_first: bool = True):
    """Materialise the reference's TFRecord shards into an indexable dataset.

    Records are {x: bytes, y: bytes} of raw pixels (Convert_tfrecords.ipynb
    cell 2).  ``shape`` is the per-image (H, W, C).
    """
    xs, ys = [], []
    for p in paths:
        for ex in tfr.read_examples(p):
            x = np.frombuffer(ex["x"][0], dtype=dtype).reshape(shape)
            y = np.frombuffer(ex["y"][0], dtype=dtype).reshape(shape)
            xs.append(x)
            ys.append(y)

    class _InMemory:
        def __len__(self):
            return len(xs)

        def __getitem__(self, i):
            x = xs[i].astype(np.float32)
            y = ys[i].astype(np.float32)
            if normalize:
                x = x / 255.0
                y = y / 255.0
            if channels_first:
                x = x.transpose(2, 0, 1)
                y = y.transpose(2, 0, 1)
            return {"x": x, "y": y}

    return _InMemory()


class TFRecordStream:
    """Streaming {'x','y'} batches straight off TFRecord shards — bounded
    RAM (one record + the shuffle buffer), no whole-shard materialisation.

    The streaming counterpart of ``tfrecord_dataset`` (which decodes every
    record of every shard into memory up front — fine at demo scale, not a
    production input story).  Records are read incrementally
    (``tfrecord.read_records_streaming``: peak RAM one record, CRC on the
    C++ fast path), decoded to float32, and collated into fixed-size
    batches.  ``shuffle_buffer > 0`` gives tf.data-style reservoir
    shuffling with a fresh seed per epoch (plus shard-order shuffling).
    Re-iterable: pass the instance itself to ``Fitter.fit`` for multi-epoch
    training.
    """

    def __init__(self, paths: Sequence[str], shape: tuple, batch_size: int,
                 dtype=np.uint8, normalize: bool = True,
                 channels_first: bool = True, shuffle_buffer: int = 0,
                 seed: int = 0, drop_remainder: bool = True,
                 verify_crc: bool = True, host_convert: bool = True):
        self.paths = list(paths)
        self.shape = shape
        self.batch_size = batch_size
        self.dtype = dtype
        self.normalize = normalize
        self.channels_first = channels_first
        self.shuffle_buffer = shuffle_buffer
        self.seed = seed
        self.drop_remainder = drop_remainder
        self.verify_crc = verify_crc
        self.host_convert = host_convert
        self._epoch = 0

    def _decode(self, ex: dict) -> dict:
        out = {}
        for k in ("x", "y"):
            a = np.frombuffer(ex[k][0], dtype=self.dtype).reshape(self.shape)
            if not self.host_convert:
                # raw stored-dtype samples (uint8 NHWC): the float32
                # conversion, /255 and NHWC->NCHW move to the accelerator
                # (``device_normalize`` under ``prefetch_to_device``'s
                # transform) — 4x less host memory traffic and H2D bytes,
                # and the per-record Python work drops to a frombuffer.
                out[k] = a
                continue
            a = a.astype(np.float32)
            if self.normalize:
                a = a / 255.0
            if self.channels_first:
                a = a.transpose(2, 0, 1)
            out[k] = a
        return out

    def _samples(self, rng) -> Iterator[dict]:
        paths = list(self.paths)
        if rng is not None:
            rng.shuffle(paths)
        buf: list[dict] = []
        for p in paths:
            for ex in tfr.read_examples(p, verify_crc=self.verify_crc,
                                        streaming=True):
                s = self._decode(ex)
                if rng is None:
                    yield s
                    continue
                buf.append(s)
                if len(buf) >= self.shuffle_buffer:
                    j = int(rng.integers(len(buf)))
                    buf[j], s = buf[-1], buf[j]
                    buf.pop()
                    yield s
        if rng is not None:
            rng.shuffle(buf)
            yield from buf

    def __iter__(self) -> Iterator[dict]:
        rng = (np.random.default_rng(self.seed + self._epoch)
               if self.shuffle_buffer > 0 else None)
        self._epoch += 1
        batch: list[dict] = []
        for s in self._samples(rng):
            batch.append(s)
            if len(batch) == self.batch_size:
                yield _collate(batch)
                batch = []
        if batch and not self.drop_remainder:
            yield _collate(batch)


def tfdata_pipeline(
    filenames: Sequence[str],
    shape: tuple,
    batch_size: int = 32,
    shuffle: bool = False,
    repeat: bool = False,
    drop_remainder: bool = True,
    replicas: int = 1,
    dtype: str = "uint8",
    normalize: bool = True,
    channels_first: bool = True,
    cache: bool = True,
) -> Iterator[dict]:
    """Stream TFRecord shards through ``tf.data`` — including ``gs://`` paths
    (the reference's GCS-backed TPU recipe, ``TPUs_in_Colab.ipynb`` cell 21).

    Reproduces ``load_dataset`` (``ViT_UNet_TF_TPU.ipynb`` cell 16):
    TFRecordDataset(parallel reads) -> cache -> repeat -> shuffle(1024 x
    replicas, nondeterministic) -> parse {x, y} raw bytes -> batch
    (drop_remainder for static TPU shapes) -> prefetch(AUTOTUNE); yields
    numpy {'x', 'y'} batches for the jitted step.  TensorFlow is an optional
    dependency of this one function; everything else in the package runs
    without it.
    """
    import tensorflow as tf  # optional, gated to this streaming path

    tf.config.set_visible_devices([], "GPU")
    auto = tf.data.AUTOTUNE
    h, w, c = shape
    tf_dtype = getattr(tf, dtype)

    def parse(example):
        feats = tf.io.parse_single_example(example, {
            "x": tf.io.FixedLenFeature([], tf.string),
            "y": tf.io.FixedLenFeature([], tf.string),
        })
        x = tf.reshape(tf.io.decode_raw(feats["x"], tf_dtype), (h, w, c))
        y = tf.reshape(tf.io.decode_raw(feats["y"], tf_dtype), (h, w, c))
        x = tf.cast(x, tf.float32)
        y = tf.cast(y, tf.float32)
        if normalize:
            x, y = x / 255.0, y / 255.0
        if channels_first:
            x = tf.transpose(x, (2, 0, 1))
            y = tf.transpose(y, (2, 0, 1))
        return {"x": x, "y": y}

    ds = tf.data.TFRecordDataset(list(filenames), num_parallel_reads=auto)
    if cache:
        ds = ds.cache()
    if repeat:
        ds = ds.repeat()
    if shuffle:
        ds = ds.shuffle(1024 * replicas)
        opt = tf.data.Options()
        opt.deterministic = False   # disable order, increase speed (cell 16)
        ds = ds.with_options(opt)
    ds = ds.map(parse, num_parallel_calls=auto)
    ds = ds.batch(batch_size, drop_remainder=drop_remainder)
    ds = ds.prefetch(auto)
    for batch in ds.as_numpy_iterator():
        yield batch


def device_normalize(normalize: bool = True, channels_first: bool = True,
                     dtype=None):
    """A jitted on-device batch preprocessor for RAW (uint8 NHWC) batches —
    the ``transform`` companion of ``TFRecordStream(host_convert=False)``:
    float conversion, /255 and NHWC->NCHW run on the accelerator (cheap,
    fused, overlapped by the prefetch queue) instead of per-record Python.
    Non-image leaves (labels, weights) pass through untouched."""
    import jax.numpy as jnp

    dt = dtype or jnp.float32

    @jax.jit
    def convert(batch):
        out = {}
        for k, v in batch.items():
            if v.ndim == 4:
                a = v.astype(dt)
                if normalize:
                    a = a / jnp.asarray(255.0, dt)
                if channels_first:
                    a = a.transpose(0, 3, 1, 2)
                out[k] = a
            else:
                out[k] = v
        return out

    return convert


class DeviceResidentData:
    """Device-resident dataset: stage the whole set to HBM ONCE (uint8 —
    4x smaller than float32), then build every batch on device with a
    jitted gather + normalize; only a ~256-byte index vector crosses the
    host boundary per batch.

    The TPU-native answer for datasets that fit HBM (the reference's demo
    scales easily do: 512 pairs of 224² uint8 = 77 MB against 16 GB):
    after the first training dispatch, some runtimes serialise or throttle
    host->device transfers against the execution stream (the tunnelled
    single-chip setup measures 3 GB/s before the first train-kernel
    program runs and ~30 MB/s after — docs/PERF.md "Data-fed
    throughput"), and even on a healthy PCIe host the staging removes all
    per-step H2D and host decode from the steady state.

    ``x``/``y``: (N, H, W, C) arrays (any host/NumPy dtype; uint8 keeps
    the residency cheap).  Batches come out as ``channels_first`` float
    ``dtype`` in [0, 1] when ``normalize`` (matching ``TFRecordStream``'s
    host-convert output).  Shuffles per epoch with a NumPy permutation on
    the host (indices only); re-iterable, so it can feed ``Fitter.fit``
    directly.
    """

    def __init__(self, x, y, batch_size: int, *, seed: int = 0,
                 shuffle: bool = True, normalize: bool = True,
                 channels_first: bool = True, dtype=None,
                 drop_remainder: bool = True, sharding=None):
        import jax.numpy as jnp

        put = ((lambda a: jax.device_put(a, sharding)) if sharding is not None
               else jax.device_put)
        self.x = put(np.ascontiguousarray(x))
        self.y = put(np.ascontiguousarray(y))
        jax.block_until_ready((self.x, self.y))   # stage eagerly, up front
        self.batch_size = batch_size
        self.seed = seed
        self.shuffle = shuffle
        self.drop_remainder = drop_remainder
        self._epoch = 0
        dt = dtype or jnp.float32

        def build(xs, ys, idx):
            out = {}
            for key, arr in (("x", xs), ("y", ys)):
                b = arr[idx].astype(dt)
                if normalize:
                    b = b / jnp.asarray(255.0, dt)
                if channels_first:
                    b = b.transpose(0, 3, 1, 2)
                out[key] = b
            return out

        self._build = jax.jit(build)

    def __len__(self) -> int:
        n = self.x.shape[0] // self.batch_size
        if not self.drop_remainder and self.x.shape[0] % self.batch_size:
            n += 1
        return n

    def __iter__(self) -> Iterator[dict]:
        n = self.x.shape[0]
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(order)
        self._epoch += 1
        for i in range(0, n, self.batch_size):
            idx = order[i:i + self.batch_size]
            if self.drop_remainder and len(idx) < self.batch_size:
                break
            yield self._build(self.x, self.y, jax.device_put(idx))


def prefetch_to_device(iterator: Iterable[dict], size: int = 2,
                       sharding=None, transform=None) -> Iterator[dict]:
    """Move batches to device (optionally with a batch sharding) ahead of the
    consumer, overlapping H2D with compute — the role tf.data's
    ``prefetch(AUTOTUNE)`` played in the reference.

    ``transform``: optional on-device function (e.g. ``device_normalize()``)
    applied after the ``device_put`` — dispatch is async, so it overlaps
    the consumer's compute like the copies do."""
    q: queue.Queue = queue.Queue(maxsize=size)
    sentinel = object()
    error: list[BaseException] = []

    def put(batch):
        # one pytree device_put (not one per leaf): a single dispatch —
        # on a tunnelled/remote runtime every call pays a round trip
        batch = (jax.device_put(batch, sharding) if sharding is not None
                 else jax.device_put(batch))
        return transform(batch) if transform is not None else batch

    def producer():
        try:
            for batch in iterator:
                q.put(put(batch))
        except BaseException as e:  # surface in the consumer, don't swallow
            error.append(e)
        finally:
            q.put(sentinel)

    threading.Thread(target=producer, daemon=True).start()
    while True:
        item = q.get()
        if item is sentinel:
            if error:
                raise error[0]
            return
        yield item
