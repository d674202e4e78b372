"""Synthetic PathTracker clip renderer + dataset builder.

The reference trains on pre-rendered "track the dot" clips (Linsley et al.,
"Tracking Without Re-recognition"): T frames of 32x32 RGB where channel 0
carries the moving dots, and channel 2 (blue) carries the start marker on
frame 0 and the candidate end marker on the last frame. The label says whether
the end marker sits on the tracked dot (1) or on a distractor (0). The repo
itself ships no generator (it reads cluster TFRecords, reference
utils/engine.py:345-404), so this renderer exists to make the framework
self-contained: it emits the exact TFRecord schema the reference consumes
(label: bytes, image: raw uint8 [T,32,32,3], height, width — reference
utils/TFRDataset.py:7-12).

Dot dynamics: smooth constrained random walks — per-step heading noise on a
constant speed, reflected at the borders. `dist` controls the number of
distractor dots, `speed` the step length multiplier, matching the dataset
axes of reference utils/engine.py:31-40.
"""

from __future__ import annotations

import os

import numpy as np

from pathtracker_tpu.data.tfrecord import build_example, write_tfrecord_file


def _walk(rng: np.random.Generator, n_dots: int, timesteps: int, speed: float,
          size: int) -> np.ndarray:
    """Smooth random walks, shape [n_dots, T, 2] in [0, size)."""
    pos = rng.uniform(2, size - 2, size=(n_dots, 2))
    heading = rng.uniform(0, 2 * np.pi, size=n_dots)
    step = 0.8 * speed
    out = np.empty((n_dots, timesteps, 2), dtype=np.float32)
    for t in range(timesteps):
        out[:, t] = pos
        heading += rng.normal(0.0, 0.45, size=n_dots)
        delta = np.stack([np.cos(heading), np.sin(heading)], -1) * step
        pos = pos + delta
        # reflect at borders
        for axis in range(2):
            low = pos[:, axis] < 1
            high = pos[:, axis] > size - 2
            pos[low, axis] = 2 - pos[low, axis]
            pos[high, axis] = 2 * (size - 2) - pos[high, axis]
        pos = np.clip(pos, 1, size - 2)
    return out


def _splat(canvas: np.ndarray, yx: np.ndarray, value: int,
           size: int = 1) -> None:
    """Draw size x size dots at float coords (nearest-pixel) into [H,W]
    uint8. size=1 keeps the original single-pixel rendering; larger dots
    give conv nets denser activations per object (the cluster datasets'
    objects are multi-pixel; $PATHTRACKER_DOT_SIZE picks this for
    synthesized data)."""
    ij = np.round(yx).astype(np.int64)
    for dy in range(-(size // 2), size - size // 2):
        for dx in range(-(size // 2), size - size // 2):
            p = np.clip(ij + np.array([dy, dx]), 0, canvas.shape[0] - 1)
            canvas[p[..., 0], p[..., 1]] = value


def render_pathtracker_clip(
    rng: np.random.Generator,
    timesteps: int = 64,
    size: int = 32,
    n_distractors: int = 14,
    speed: float = 1.0,
    positive: bool | None = None,
    dot_size: int | None = None,
) -> tuple[np.ndarray, int]:
    """Render one clip. Returns (uint8 [T,H,W,3], label in {0,1}).

    dot_size defaults to $PATHTRACKER_DOT_SIZE (or 1)."""
    if dot_size is None:
        raw = os.environ.get("PATHTRACKER_DOT_SIZE", "1")
        try:
            dot_size = int(raw)
        except ValueError:
            raise ValueError(
                f"$PATHTRACKER_DOT_SIZE must be an integer >= 1, got {raw!r}")
    if dot_size < 1:
        raise ValueError(
            f"dot_size must be >= 1 (got {dot_size}; check $PATHTRACKER_DOT_SIZE)"
            " — size < 1 would render blank clips with labels")
    if positive is None:
        positive = bool(rng.integers(0, 2))
    n_dots = n_distractors + 1
    tracks = _walk(rng, n_dots, timesteps, speed, size)  # [n, T, 2]
    target = tracks[0]

    clip = np.zeros((timesteps, size, size, 3), dtype=np.uint8)
    for t in range(timesteps):
        _splat(clip[t, :, :, 0], tracks[:, t], 255, dot_size)  # all dots, red channel

    # Blue channel: start marker on frame 0, candidate end marker on last frame.
    _splat(clip[0, :, :, 2], target[0], 255, dot_size)
    if positive or n_distractors == 0:
        end = target[-1]
        label = 1
    else:
        end = tracks[1 + rng.integers(0, n_distractors), -1]
        label = 0
    _splat(clip[-1, :, :, 2], end, 255, dot_size)
    return clip, label


def make_synthetic_dataset(
    root: str,
    n_train: int = 64,
    n_test: int = 64,
    timesteps: int = 64,
    size: int = 32,
    n_distractors: int = 14,
    speed: float = 1.0,
    shards: int = 2,
    seed: int = 0,
) -> str:
    """Render a train/test TFRecord dataset under `root`; returns `root`.

    File naming follows the reference's glob patterns 'train-*' / 'test-*'
    (reference mainclean.py:116-119).
    """
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    for split, count in (("train", n_train), ("test", n_test)):
        per_shard = -(-count // shards)
        idx = 0
        for shard in range(shards):
            payloads = []
            for _ in range(min(per_shard, count - idx)):
                clip, label = render_pathtracker_clip(
                    rng, timesteps=timesteps, size=size,
                    n_distractors=n_distractors, speed=speed)
                payloads.append(build_example({
                    "label": bytes([label]),
                    "image": clip.tobytes(),
                    "height": size,
                    "width": size,
                }))
                idx += 1
            path = os.path.join(root, f"{split}-{shard:05d}-of-{shards:05d}.tfrecord")
            write_tfrecord_file(path, payloads)
    return root


def _main():
    """CLI: render a PathTracker TFRecord dataset.

        python -m pathtracker_tpu.data.pathtracker \
            --root datasets/64_1_14 --length 64 --dist 14 \
            --train 20000 --test 20000 --shards 10

    Produces the exact GZIP TFRecord schema the reference's loaders read
    (reference utils/TFRDataset.py:7-12) under the 'train-*'/'test-*'
    naming its scripts glob — the reference itself ships no generator (its
    data lives on a private cluster, reference utils/engine.py:345-404)."""
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", required=True)
    ap.add_argument("--train", type=int, default=20000)
    ap.add_argument("--test", type=int, default=20000)
    ap.add_argument("--length", type=int, default=64, help="frames per clip")
    ap.add_argument("--dist", type=int, default=14, help="distractor count")
    ap.add_argument("--speed", type=float, default=1.0)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--shards", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args()
    out = make_synthetic_dataset(
        a.root, n_train=a.train, n_test=a.test, timesteps=a.length,
        size=a.size, n_distractors=a.dist, speed=a.speed, shards=a.shards,
        seed=a.seed)
    print(f"wrote {a.train}+{a.test} clips (T={a.length}, dist={a.dist}, "
          f"speed={a.speed:g}) under {out}")


if __name__ == "__main__":
    _main()
