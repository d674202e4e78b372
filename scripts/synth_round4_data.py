"""Round-4 data synthesis (CPU, background):

1. 20k EXTRA (dist=14, speed=1, T=64) train clips, fresh seed, written as
   train-extra-* shards into an AUGMENTED data root (datasets_aug) whose
   test/train originals are symlinks to the canonical dir — the canonical
   dir (and the coldstart run reading it) is untouched, and the held-out
   test shards stay byte-identical.
2. 20k (dist=14, speed=4, T=64) train clips added in place (that config dir
   has only 128 train clips from the eval-time synthesis; its 2500-clip
   test shards are preserved).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PATHTRACKER_DOT_SIZE", "2")
# SYNTH_PARTS=1 runs only the (14,1,64) augmented root (part 2's speed-4
# top-up is unnecessary when the speed-4 fine-tune synthesizes its own 20k
# train clips on first touch via --synth-train).
PARTS = os.environ.get("SYNTH_PARTS", "12")
import numpy as np
from pathtracker_tpu.data.pathtracker import render_pathtracker_clip
from pathtracker_tpu.data.tfrecord import build_example, write_tfrecord_file

SIZE = 32

def render_train_shards(root, n, timesteps, dist, speed, seed, prefix, shards=4):
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    per = -(-n // shards)
    idx = 0
    t0 = time.time()
    for s in range(shards):
        payloads = []
        for _ in range(min(per, n - idx)):
            clip, label = render_pathtracker_clip(
                rng, timesteps=timesteps, size=SIZE,
                n_distractors=dist, speed=speed)
            payloads.append(build_example({
                "label": bytes([label]),
                "image": clip.tobytes(),
                "height": SIZE,
                "width": SIZE,
            }))
            idx += 1
        path = os.path.join(root, f"{prefix}-{s:05d}-of-{shards:05d}.tfrecord")
        write_tfrecord_file(path, payloads)
        print(f"{path}: {len(payloads)} clips ({time.time()-t0:.0f}s)", flush=True)

# --- 1. augmented root for (14,1,64) ---
if "1" in PARTS:
    canon = "/root/repo/datasets/pathtracker_64_32_32/14_dist_speed_1/tfrecords"
    aug = "/root/repo/datasets_aug/pathtracker_64_32_32/14_dist_speed_1/tfrecords"
    os.makedirs(aug, exist_ok=True)
    for f in sorted(os.listdir(canon)):
        if f.endswith(".tfrecord"):
            dst = os.path.join(aug, f)
            if not os.path.exists(dst):
                os.symlink(os.path.join(canon, f), dst)
    render_train_shards(aug, 20000, 64, 14, 1.0, seed=424242, prefix="train-extra")
    with open(os.path.join(aug, "COUNTS"), "w") as f:
        f.write("40000 2500")
    print("aug (14,1,64) done", flush=True)

# --- 2. in-place train top-up for (14,4,64) ---
if "2" in PARTS:
    s4 = "/root/repo/datasets/pathtracker_64_32_32/14_dist_speed_4/tfrecords"
    render_train_shards(s4, 20000, 64, 14, 4.0, seed=777001, prefix="train-extra")
    with open(os.path.join(s4, "COUNTS"), "w") as f:
        f.write("20128 2500")
    print("speed4 train top-up done", flush=True)
print("ALL DONE", flush=True)
