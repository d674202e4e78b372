"""Host-side input pipeline: glob -> decode -> shuffle -> batch -> prefetch.

TF-free replacement for the reference's tf.data pipeline (reference
utils/TFRDataset.py:31-53): TFRecordDataset(GZIP) -> map(decode) ->
prefetch(AUTOTUNE) -> shuffle(1000, reshuffle each iteration) ->
batch(drop_remainder). Decode runs in a pool of worker threads (the native
C++ reader in native/ptdata.cc releases the GIL, so threads scale), batches
are assembled into pinned numpy buffers, and a background prefetcher keeps a
small queue ahead of the training loop so host IO overlaps device compute.

Batches are (uint8 [B,T,H,W,3], uint8 labels [B]) — normalization and layout
happen on device in pathtracker_tpu.data.prepare (the reference did this work
on host per batch, reference utils/engine.py:220-243, which was its known
bottleneck; see SURVEY.md §3.5).
"""

from __future__ import annotations

import glob as _glob
import queue
import threading

import numpy as np

from pathtracker_tpu.data import native as _native
from pathtracker_tpu.data.tfrecord import read_clip_records


class ClipDataset:
    """Re-iterable dataset of (clip_batch, label_batch) numpy arrays."""

    def __init__(
        self,
        files: list[str],
        batch_size: int,
        timesteps: int,
        height: int = 32,
        width: int = 32,
        drop_remainder: bool = True,
        shuffle_buffer: int = 1000,
        seed: int | None = None,
        prefetch: int = 4,
        shard_index: int = 0,
        shard_count: int = 1,
    ):
        if not files:
            raise ValueError("no input files")
        if not (0 <= shard_index < shard_count):
            raise ValueError(f"shard_index {shard_index} not in "
                             f"[0, {shard_count})")
        self.files = list(files)
        # Multi-host sharding: each process reads a disjoint slice of the
        # dataset (the reference is single-host; under jax.distributed every
        # process would otherwise read EVERYTHING). File-level round-robin
        # when there are enough shard files, else record-level striding
        # inside every file — either way the union over processes is the
        # full dataset and the slices are disjoint.
        self._record_stride = None
        if shard_count > 1:
            if len(self.files) >= shard_count:
                self.files = self.files[shard_index::shard_count]
            else:
                self._record_stride = (shard_index, shard_count)
        self.batch_size = batch_size
        self.timesteps = timesteps
        self.height = height
        self.width = width
        self.drop_remainder = drop_remainder
        self.shuffle_buffer = shuffle_buffer
        self.prefetch = prefetch
        self._rng = np.random.default_rng(seed)
        self._epoch = 0

    # -- record streaming ---------------------------------------------------

    def _iter_records(self):
        files = list(self.files)
        if self.shuffle_buffer > 0 and self._record_stride is None:
            # Striding mode keeps the canonical file order: the global record
            # index must mean the same thing on every rank AND every epoch
            # (stable slice membership — pinned in test_tfrecord). Shuffling
            # still happens within shards and across shard remainders.
            self._rng.shuffle(files)
        # Record striding (files < processes) is over the GLOBAL record index,
        # continuous across file boundaries — a per-file index would hand the
        # low ranks an extra record per file, and the final incomplete stride
        # block is dropped on every rank, so all ranks yield exactly
        # floor(N/cnt) records. Both matter for SPMD: one extra batch on one
        # rank leaves it in a train-step collective while its peers enter
        # eval — a live deadlock (tests/test_multihost.py, 4-rank CLI).
        gi = 0
        pending = None  # last matched record, held until its block completes
        pending_block = -1
        lo = cnt = None
        if self._record_stride is not None:
            lo, cnt = self._record_stride
        for path in files:
            if _native.available():
                records = _native.read_clip_records(
                    path, self.timesteps, self.height, self.width)
            else:
                records = read_clip_records(
                    path, self.timesteps, self.height, self.width)
            if self._record_stride is None:
                yield from records
                continue
            for item in records:
                if gi % cnt == lo:
                    if pending is not None:
                        yield pending
                    pending = item
                    pending_block = gi // cnt
                gi += 1
        if pending is not None and (pending_block + 1) * cnt <= gi:
            yield pending  # its stride block is complete (N covers it)

    def _iter_shuffled(self):
        if self.shuffle_buffer <= 0:
            yield from self._iter_records()
            return
        buf = []
        rng = self._rng
        for item in self._iter_records():
            if len(buf) < self.shuffle_buffer:
                buf.append(item)
                continue
            j = rng.integers(0, len(buf))
            buf[j], item = item, buf[j]
            yield item
        rng.shuffle(buf)
        yield from buf

    def _iter_batches_native(self):
        """Fast path: decode a whole shard via the C++ reader, permute clip
        indices, and gather each batch with ONE fancy-index copy instead of
        per-clip copies (per-clip 50-200KB copies cost ~0.6ms each on this VM
        — they dominated the pipeline). Shuffle = shuffled shard order + a
        full permutation within each shard (>= the reference's
        shuffle(1000) window for the reference's shard sizes); batch
        remainders carry across shard boundaries and mix streams."""
        files = list(self.files)
        if self.shuffle_buffer > 0 and self._record_stride is None:
            # Canonical file order under striding — see _iter_records.
            self._rng.shuffle(files)
        rem_clips: list[np.ndarray] = []
        rem_labels: list[np.ndarray] = []
        bs = self.batch_size

        # Decode lookahead: inflate+parse shard i+1 on a worker thread while
        # batches are gathered from shard i (the ctypes decode releases the
        # GIL, so this is true overlap).
        from concurrent.futures import ThreadPoolExecutor

        def open_shard(path):
            return _native.ShardView(path, self.timesteps, self.height,
                                     self.width)

        pool = ThreadPoolExecutor(max_workers=1)
        futures = [pool.submit(open_shard, files[0])]
        # Striding is over the GLOBAL record index (continuous across
        # shards), and the final incomplete stride block is dropped, so all
        # ranks yield exactly floor(N/cnt) records — see _iter_records.
        stride_base = 0
        try:
            for fi in range(len(files)):
                if fi + 1 < len(files):
                    futures.append(pool.submit(open_shard, files[fi + 1]))
                with futures.pop(0).result() as shard:
                    n = len(shard)
                    order = (self._rng.permutation(n) if self.shuffle_buffer > 0
                             else np.arange(n))
                    if self._record_stride is not None:
                        lo, cnt = self._record_stride
                        order = order[(order + stride_base) % cnt == lo]
                        if fi == len(files) - 1:
                            # N is known only at the last shard; cut records
                            # from the incomplete final block.
                            total = stride_base + n
                            order = order[order + stride_base
                                          < (total // cnt) * cnt]
                        stride_base += n
                        n = len(order)
                    start = 0
                    if rem_clips:
                        have = sum(c.shape[0] for c in rem_clips)
                        take = min(bs - have, n)
                        rem_clips.append(shard.clips[order[:take]])
                        rem_labels.append(shard.labels[order[:take]])
                        start = take
                        if have + take == bs:
                            yield (np.concatenate(rem_clips),
                                   np.concatenate(rem_labels))
                            rem_clips, rem_labels = [], []
                    while start + bs <= n:
                        idx = order[start:start + bs]
                        yield shard.clips[idx], shard.labels[idx].copy()
                        start += bs
                    if start < n:
                        rem_clips.append(shard.clips[order[start:]])
                        rem_labels.append(shard.labels[order[start:]])
        finally:
            for fut in futures:
                try:
                    fut.result().close()
                except Exception:
                    pass
            pool.shutdown(wait=False)
        while rem_clips:
            clips = np.concatenate(rem_clips)
            labels = np.concatenate(rem_labels)
            rem_clips, rem_labels = [], []
            if clips.shape[0] >= bs:
                yield clips[:bs], labels[:bs]
                if clips.shape[0] > bs:
                    rem_clips, rem_labels = [clips[bs:]], [labels[bs:]]
            elif not self.drop_remainder:
                yield clips, labels

    def _iter_batches(self):
        if _native.available():
            yield from self._iter_batches_native()
            return
        clips, labels = [], []
        for clip, label in self._iter_shuffled():
            clips.append(clip)
            labels.append(label)
            if len(clips) == self.batch_size:
                yield np.stack(clips), np.asarray(labels, dtype=np.uint8)
                clips, labels = [], []
        if clips and not self.drop_remainder:
            yield np.stack(clips), np.asarray(labels, dtype=np.uint8)

    # -- prefetching iterator ----------------------------------------------

    def __iter__(self):
        self._epoch += 1
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err: list[BaseException] = []

        def producer():
            try:
                for batch in self._iter_batches():
                    q.put(batch)
            except BaseException as e:  # surfaced in the consumer
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item


def tfr_data_loader(
    data_dir: str = "",
    batch_size: int = 32,
    drop_remainder: bool = True,
    shuffle_buffer: int = 1000,
    timesteps: int = 64,
    height: int = 32,
    width: int = 32,
    seed: int | None = None,
    shard_index: int = 0,
    shard_count: int = 1,
) -> ClipDataset:
    """Build a clip loader from a glob pattern (e.g. root + 'train-*').

    Signature-compatible with the reference's tfr_data_loader (reference
    utils/TFRDataset.py:31), including the height/width/shuffle_buffer
    keywords its viz script expected (reference viz_model_att.py:156).
    shard_index/shard_count give each multi-host process a disjoint slice
    (pass jax.process_index()/jax.process_count()).
    """
    files = sorted(_glob.glob(data_dir))
    return ClipDataset(
        files,
        batch_size=batch_size,
        timesteps=timesteps,
        height=height,
        width=width,
        drop_remainder=drop_remainder,
        shuffle_buffer=shuffle_buffer,
        seed=seed,
        shard_index=shard_index,
        shard_count=shard_count,
    )
