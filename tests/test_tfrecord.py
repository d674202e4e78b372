"""Data-layer tests: TFRecord codec round-trip, schema parity with
tf.train.Example (cross-checked against TensorFlow when available), synthetic
renderer invariants, and pipeline batching semantics."""

import glob
import os

import numpy as np
import pytest

from pathtracker_tpu.data.tfrecord import (
    build_example,
    crc32c,
    masked_crc32c,
    parse_example,
    read_clip_records,
    read_tfrecord_file,
    write_tfrecord_file,
)
from pathtracker_tpu.data.pathtracker import make_synthetic_dataset, render_pathtracker_clip
from pathtracker_tpu.data.pipeline import tfr_data_loader


def test_crc32c_known_vectors():
    # Standard CRC32C test vectors.
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_crc_fallback_warns_once(capsys, monkeypatch):
    """A missing native library must not silently 10x the TFRecord write
    time (it cost a full dataset-synthesis stall once): the pure-Python CRC
    fallback prints ONE warning on the first large payload, and tiny header
    CRCs never trigger it."""
    from pathtracker_tpu.data import native, tfrecord

    monkeypatch.setattr(native, "crc32c", lambda data: None)
    monkeypatch.setattr(tfrecord, "_warned_slow_crc", False)
    crc32c(b"tiny")
    assert "native CRC32C" not in capsys.readouterr().out
    crc32c(b"\x00" * 5000)
    out = capsys.readouterr().out
    assert "make -C native" in out
    crc32c(b"\x00" * 5000)
    assert "native CRC32C" not in capsys.readouterr().out  # once only


def test_example_roundtrip():
    feats = {
        "label": b"\x01",
        "image": b"\x00\x01\x02\x03" * 8,
        "height": 32,
        "width": 32,
        "scores": [0.5, 1.25],
    }
    buf = build_example(feats)
    parsed = parse_example(buf)
    assert parsed["label"] == [b"\x01"]
    assert parsed["image"] == [feats["image"]]
    assert parsed["height"] == [32]
    assert parsed["width"] == [32]
    assert parsed["scores"] == [0.5, 1.25]


def test_tfrecord_file_roundtrip(tmp_path):
    path = str(tmp_path / "x.tfrecord")
    payloads = [b"abc", b"", os.urandom(1000)]
    write_tfrecord_file(path, payloads)
    got = list(read_tfrecord_file(path, verify_crc=True))
    assert got == payloads


def test_example_parses_with_tensorflow(tmp_path):
    """Cross-check our writer against TensorFlow's parser (oracle test)."""
    tf = pytest.importorskip("tensorflow")
    clip = np.arange(4 * 32 * 32 * 3, dtype=np.uint8).reshape(4, 32, 32, 3)
    buf = build_example({"label": b"\x01", "image": clip.tobytes(), "height": 32, "width": 32})
    path = str(tmp_path / "tf.tfrecord")
    write_tfrecord_file(path, [buf])

    ds = tf.data.TFRecordDataset([path], compression_type="GZIP")
    features = {
        "label": tf.io.FixedLenFeature([], tf.string),
        "image": tf.io.FixedLenFeature([], tf.string),
        "height": tf.io.FixedLenFeature([], tf.int64),
        "width": tf.io.FixedLenFeature([], tf.int64),
    }
    rec = next(iter(ds))
    ex = tf.io.parse_single_example(rec, features)
    img = tf.io.decode_raw(ex["image"], tf.uint8).numpy().reshape(4, 32, 32, 3)
    np.testing.assert_array_equal(img, clip)
    assert ex["label"].numpy() == b"\x01"
    assert int(ex["height"]) == 32


def test_reads_tensorflow_written_records(tmp_path):
    """And the converse: our reader parses TF-written records."""
    tf = pytest.importorskip("tensorflow")
    path = str(tmp_path / "tfw.tfrecord")
    clip = np.zeros((4, 32, 32, 3), dtype=np.uint8)
    ex = tf.train.Example(features=tf.train.Features(feature={
        "label": tf.train.Feature(bytes_list=tf.train.BytesList(value=[b"\x00"])),
        "image": tf.train.Feature(bytes_list=tf.train.BytesList(value=[clip.tobytes()])),
        "height": tf.train.Feature(int64_list=tf.train.Int64List(value=[32])),
        "width": tf.train.Feature(int64_list=tf.train.Int64List(value=[32])),
    }))
    with tf.io.TFRecordWriter(path, options="GZIP") as w:
        w.write(ex.SerializeToString())
    clips = list(read_clip_records(path, timesteps=4))
    assert len(clips) == 1
    got_clip, label = clips[0]
    np.testing.assert_array_equal(got_clip, clip)
    assert label == 0


def test_render_clip_invariants(rng):
    clip, label = render_pathtracker_clip(rng, timesteps=16, n_distractors=5)
    assert clip.shape == (16, 32, 32, 3)
    assert clip.dtype == np.uint8
    assert label in (0, 1)
    # Start marker on frame 0 blue channel, end marker on last frame.
    assert clip[0, :, :, 2].max() == 255
    assert clip[-1, :, :, 2].max() == 255
    assert all(clip[t, :, :, 2].max() == 0 for t in range(1, 15))
    # Dots present in red channel every frame.
    assert all(clip[t, :, :, 0].max() == 255 for t in range(16))


def test_synthetic_dataset_and_loader(tmp_path):
    root = str(tmp_path / "ds")
    make_synthetic_dataset(root, n_train=10, n_test=6, timesteps=8, shards=2)
    assert len(glob.glob(os.path.join(root, "train-*"))) == 2
    loader = tfr_data_loader(os.path.join(root, "train-*"), batch_size=4,
                             timesteps=8, shuffle_buffer=8, seed=0)
    batches = list(loader)
    assert len(batches) == 2  # drop_remainder drops the last 2 clips
    imgs, labels = batches[0]
    assert imgs.shape == (4, 8, 32, 32, 3)
    assert imgs.dtype == np.uint8
    assert labels.shape == (4,)
    # Re-iterable (epoch 2) with reshuffling.
    assert len(list(loader)) == 2


def test_truncated_shard_fails_loudly(tmp_path):
    """A clipped shard (interrupted copy) must raise in BOTH decoders — never
    silently yield a partial dataset (the 'train on a fraction with no
    error' failure mode)."""
    import gzip

    from pathtracker_tpu.data import native as native_mod
    from pathtracker_tpu.data.tfrecord import read_tfrecord_file

    root = str(tmp_path / "ds")
    make_synthetic_dataset(root, n_train=6, n_test=2, timesteps=4, shards=1)
    path = os.path.join(root, "train-00000-of-00001.tfrecord")

    # Cut the INNER framing mid-record (drop the last 100 bytes — less than
    # one record's payload+crc tail) but keep the gzip member valid.
    raw = gzip.open(path, "rb").read()
    cut = os.path.join(root, "cut.tfrecord")
    with gzip.open(cut, "wb") as f:
        f.write(raw[: len(raw) - 100])

    with pytest.raises(ValueError, match="truncated TFRecord"):
        list(read_tfrecord_file(cut))
    if native_mod.available():
        with pytest.raises(IOError):
            native_mod.ShardView(cut, 4, 32, 32)

    # Intact file still reads fully through both paths.
    assert len(list(read_tfrecord_file(path))) == 6
    if native_mod.available():
        with native_mod.ShardView(path, 4, 32, 32) as sv:
            assert len(sv) == 6


def test_multihost_sharding_disjoint_union(tmp_path):
    """shard_index/shard_count (multi-host data sharding): processes see
    DISJOINT slices whose union is the full dataset — both the file-level
    path (files >= shards) and the record-striding path (files < shards)."""
    root = str(tmp_path / "ds")
    make_synthetic_dataset(root, n_train=16, n_test=4, timesteps=4, shards=4)
    pattern = os.path.join(root, "train-*")

    def clip_keys(loader):
        keys = []
        for imgs, labels in loader:
            for i in range(imgs.shape[0]):
                keys.append(imgs[i].tobytes())
        return keys

    full = set(clip_keys(tfr_data_loader(pattern, batch_size=1, timesteps=4,
                                         shuffle_buffer=0)))
    assert len(full) == 16

    # File-level: 2 shards over 4 files.
    parts_f = [set(clip_keys(tfr_data_loader(
        pattern, batch_size=1, timesteps=4, shuffle_buffer=0,
        shard_index=i, shard_count=2))) for i in range(2)]
    assert parts_f[0].isdisjoint(parts_f[1])
    assert parts_f[0] | parts_f[1] == full

    # Record-striding: 8 shards over 4 files forces the per-record path.
    parts_r = [set(clip_keys(tfr_data_loader(
        pattern, batch_size=1, timesteps=4, shuffle_buffer=0,
        shard_index=i, shard_count=8))) for i in range(8)]
    for i in range(8):
        for j in range(i + 1, 8):
            assert parts_r[i].isdisjoint(parts_r[j])
    assert set().union(*parts_r) == full

    # Shuffled epochs keep the same slice membership (only order changes).
    ld = tfr_data_loader(pattern, batch_size=1, timesteps=4,
                         shuffle_buffer=100, seed=3,
                         shard_index=1, shard_count=8)
    assert set(clip_keys(ld)) == parts_r[1]
    assert set(clip_keys(ld)) == parts_r[1]


def test_prepare_batch_layout_and_disentangle():
    from pathtracker_tpu.data.prepare import prepare_batch

    imgs = np.zeros((2, 4, 32, 32, 3), dtype=np.uint8)
    imgs[0, 0, 1, 2, 0] = 255
    labels = np.array([1, 0], dtype=np.uint8)
    x, t = prepare_batch(imgs, labels)
    assert x.shape == (2, 3, 4, 32, 32)
    assert float(x[0, 0, 0, 1, 2]) == 1.0
    np.testing.assert_allclose(np.asarray(t), [1.0, 0.0])

    x2, _ = prepare_batch(imgs, labels, coord_channels=True)
    assert x2.shape == (2, 5, 4, 32, 32)
    assert float(x2[0, 3, 0, 0, 0]) == 1.0  # 1-indexed hh grid
    assert float(x2[0, 4, 0, 0, 31]) == 32.0

    # Disentangle: single 255 in ch0 -> mask==1 -> goes to channel 1.
    x3, _ = prepare_batch(imgs, labels, disentangle_channels=True)
    assert float(x3[0, 1, 0, 1, 2]) == 1.0
    assert float(x3[0, 0, 0, 1, 2]) == 0.0


def test_native_reader_matches_python_codec(tmp_path):
    """The C++ fast path (ShardView + index-gather batching) must agree with
    the pure-Python codec record-for-record, and fail loudly on truncation."""
    import pytest

    from pathtracker_tpu.data import native

    if not native.available():
        pytest.skip("libptdata.so not built (make -C native)")

    from pathtracker_tpu.data.pathtracker import make_synthetic_dataset
    from pathtracker_tpu.data.pipeline import ClipDataset
    from pathtracker_tpu.data.tfrecord import read_clip_records as py_read

    root = make_synthetic_dataset(str(tmp_path), n_train=13, n_test=0,
                                  timesteps=4, shards=2, seed=3)
    files = sorted(glob.glob(os.path.join(root, "train-*")))

    # Record-level agreement per shard.
    for path in files:
        with native.ShardView(path, timesteps=4) as shard:
            py = list(py_read(path, 4))
            assert len(shard) == len(py)
            for i, (clip, label) in enumerate(py):
                np.testing.assert_array_equal(shard.clips[i], clip)
                assert int(shard.labels[i]) == label

    # Batching: full coverage incl. the cross-shard remainder carry.
    ds = ClipDataset(files, batch_size=4, timesteps=4, shuffle_buffer=8,
                     seed=0, drop_remainder=False)
    seen = []
    for clips, labels in ds:
        assert clips.shape[1:] == (4, 32, 32, 3)
        assert clips.shape[0] == labels.shape[0]
        seen.extend(labels.tolist())
    assert len(seen) == 13  # every record exactly once

    # Truncated gzip shard must raise, not silently shrink.
    blob = open(files[0], "rb").read()
    bad = tmp_path / "train-bad.tfrecord"
    bad.write_bytes(blob[: len(blob) // 2])
    with pytest.raises(IOError):
        native.ShardView(str(bad), timesteps=4)


def test_synthetic_task_is_learnable():
    """Data soundness: a greedy nearest-neighbor tracker (follow the dot
    closest to the previous position, then compare with the end marker)
    scores far above chance on the synthetic task — the label carries real
    trackable signal, with difficulty scaling along the reference's dataset
    axes (more distractors / longer clips -> more identity-swap ambiguity)."""
    import numpy as np

    from pathtracker_tpu.data.pathtracker import render_pathtracker_clip
    from pathtracker_tpu.eval.greedy import greedy_accuracy_over_records

    def greedy_acc(n, timesteps, dist, seed=0):
        rng = np.random.default_rng(seed)
        records = (render_pathtracker_clip(rng, timesteps=timesteps,
                                           n_distractors=dist)
                   for _ in range(n))
        acc, seen = greedy_accuracy_over_records(records)
        assert seen == n
        return acc

    easy = greedy_acc(120, timesteps=16, dist=1)
    hard = greedy_acc(120, timesteps=64, dist=14)
    assert easy > 0.9, easy   # measured 0.97 at n=400
    assert hard > 0.5, hard   # measured 0.63 at n=400
    assert easy > hard


def test_greedy_cli_and_response_proxy(tmp_path, capsys):
    """eval/greedy.py: the CLI reproduces the BASELINE-style bar on real
    shards (with T inferred from the records), and the human-proxy response
    is confidence-shaped — high when the tracker lands on the end marker,
    decaying with endpoint distance."""
    import numpy as np

    from pathtracker_tpu.data.pathtracker import (make_synthetic_dataset,
                                                  render_pathtracker_clip)
    from pathtracker_tpu.data.tfrecord import read_clip_records
    from pathtracker_tpu.eval import greedy

    root = make_synthetic_dataset(str(tmp_path), n_train=4, n_test=40,
                                  timesteps=12, n_distractors=1, shards=2)

    # timesteps inference from the schema's height/width features
    import glob
    clips = [c for p in sorted(glob.glob(root + "/test-*"))
             for c, _ in read_clip_records(p)]
    assert clips[0].shape == (12, 32, 32, 3)

    import sys
    from unittest import mock
    with mock.patch.object(sys, "argv", [
            "greedy", "--glob", root + "/test-*", "--n", "40"]):
        greedy._main()
    out = capsys.readouterr().out
    acc = float(out.split()[3])
    assert acc > 0.8  # dist=1/T=12 is easy for the greedy tracker

    # response proxy: correct-positive clips read confident-high, and the
    # proxy accuracy over a batch matches greedy_track's decisions
    rng = np.random.default_rng(3)
    resp = greedy.greedy_responses_for_shards(root + "/test-*", 12, 16)
    assert resp.shape == (16,) and np.all((resp >= 0.05) & (resp <= 0.95))
    clip, label = render_pathtracker_clip(rng, timesteps=8, n_distractors=0)
    pred, dist = greedy.greedy_track(clip)
    if label == 1:  # no distractors: tracker follows the only dot
        assert pred == 1 and greedy.greedy_response(clip) == 0.95


def test_load_resident_survives_shard_pooling(tmp_path):
    """load_resident must deep-copy out of each ShardView: the native handle
    pool reuses decode buffers across shards, so a kept VIEW of shard i
    silently becomes shard i+1's clips after the next open (this produced
    50% label noise in every multi-shard --device-data run before the fix)."""
    import numpy as np

    from pathtracker_tpu.data import native
    from pathtracker_tpu.data.pathtracker import make_synthetic_dataset
    from pathtracker_tpu.data.resident import load_resident
    from pathtracker_tpu.data.tfrecord import read_clip_records

    if not native.available():
        import pytest
        pytest.skip("native library not built")

    root = make_synthetic_dataset(str(tmp_path), n_train=48, n_test=8,
                                  timesteps=6, n_distractors=2, shards=4)
    clips, labels = load_resident(root + "/train-*", timesteps=6)
    clips, labels = np.asarray(clips), np.asarray(labels)

    disk_clips, disk_labels = [], []
    import glob
    for path in sorted(glob.glob(root + "/train-*")):
        for c, l in read_clip_records(path, timesteps=6):
            disk_clips.append(c)
            disk_labels.append(l)
    np.testing.assert_array_equal(labels, np.asarray(disk_labels, np.uint8))
    np.testing.assert_array_equal(clips, np.stack(disk_clips))


def test_record_striding_equalizes_rank_counts(tmp_path):
    """SPMD alignment contract (round-4 multihost deadlock regression):
    with files < processes, every rank must yield EXACTLY floor(N/cnt)
    records — global-index striding continuous across file boundaries,
    incomplete final stride block dropped. A per-file stride index hands
    low ranks an extra record per file; one extra batch on one rank leaves
    it in a train-step collective while its peers enter eval."""
    root = str(tmp_path / "ds")
    # 18 records over 2 files (9+9), 4 ranks: naive per-file striding gives
    # ranks (0,1) 3+3=6 and ranks (2,3) 2+2=4; the contract is 4/4/4/4
    # (floor(18/4), the 2-record tail block dropped everywhere).
    make_synthetic_dataset(root, n_train=18, n_test=4, timesteps=4, shards=2)
    pattern = os.path.join(root, "train-*")

    def records_of(loader):
        out = []
        for imgs, labels in loader:
            for i in range(imgs.shape[0]):
                out.append(imgs[i].tobytes())
        return out

    parts = [records_of(tfr_data_loader(
        pattern, batch_size=1, timesteps=4, shuffle_buffer=0,
        shard_index=r, shard_count=4)) for r in range(4)]
    assert [len(p) for p in parts] == [4, 4, 4, 4], [len(p) for p in parts]
    sets = [set(p) for p in parts]
    for i in range(4):
        for j in range(i + 1, 4):
            assert sets[i].isdisjoint(sets[j])
    # Union = the first 16 records (complete blocks); 2 dropped.
    assert len(set().union(*sets)) == 16

    # Shuffled epochs: membership is stable, counts stay equal.
    ld = tfr_data_loader(pattern, batch_size=1, timesteps=4,
                         shuffle_buffer=50, seed=7,
                         shard_index=0, shard_count=4)
    e1, e2 = records_of(ld), records_of(ld)
    assert sorted(e1) == sorted(e2)
    assert set(e1) == sets[0]

    # The pure-python fallback (_iter_records) must implement the identical
    # contract — same counts, same membership as the native fast path.
    from unittest import mock

    from pathtracker_tpu.data import native as _native_mod

    with mock.patch.object(_native_mod, "available", lambda: False):
        pure = [records_of(tfr_data_loader(
            pattern, batch_size=1, timesteps=4, shuffle_buffer=0,
            shard_index=r, shard_count=4)) for r in range(4)]
    assert [set(p) for p in pure] == sets
