"""Checkpoint IO: one coherent msgpack format + best-checkpoint selection.

Fixes the reference's split-brain checkpointing (EarlyStopping wrote a raw
state_dict while engine.load_ckpt expected {'state_dict': ...} — reference
utils/earlystopping.py:55 vs utils/engine.py:262): every checkpoint here is
  {"state_dict": params-pytree, "epoch": int, "acc": float, "extra": {...}}
serialized with flax msgpack. `find_best_checkpoint` reproduces the
val.npz-argmax + mtime-sorted selection of reference test_model.py:59-64.
"""

from __future__ import annotations

import glob
import os

import numpy as np
from flax import serialization


def save_checkpoint(path: str, params, epoch: int = 0, acc: float = 0.0,
                    extra: dict | None = None) -> None:
    import jax

    state = {
        "state_dict": jax.device_get(params),
        "epoch": np.asarray(epoch),
        "acc": np.asarray(acc),
        "extra": jax.device_get(extra) if extra else {},
    }
    blob = serialization.msgpack_serialize(state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def _is_torch_pickle(path: str) -> bool:
    """Reference .pth.tar files are torch pickles: a zip archive (new format,
    'PK\\x03\\x04') or a bare pickle stream (legacy: PROTO opcode 0x80
    followed by a protocol number 2-5 — torch uses protocol 2+). A bare
    0x80 first byte alone is NOT enough: msgpack encodes an empty fixmap as
    0x80 too, so require the plausible protocol byte after it."""
    with open(path, "rb") as f:
        head = f.read(4)
    if head[:4] == b"PK\x03\x04":
        return True
    return len(head) >= 2 and head[0] == 0x80 and 2 <= head[1] <= 5


def load_checkpoint(path: str) -> dict:
    if _is_torch_pickle(path):
        from pathtracker_tpu.train.torch_import import load_torch_checkpoint

        return load_torch_checkpoint(path)
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def load_params(path: str, template=None, strict: bool = True):
    """Restore params from a checkpoint; with a template pytree, missing keys
    keep template values when strict=False (the reference viz script wanted
    load_ckpt(..., strict=False), reference viz_model_att.py:172).

    Reference torch checkpoints (.pth.tar, raw state_dict or
    {'state_dict': ...}, with or without DataParallel's 'module.' prefix)
    are detected by file magic and imported via train/torch_import.py —
    a reference user's trained InT/hgru/gru artifacts load directly."""
    state = load_checkpoint(path)
    params = state["state_dict"] if "state_dict" in state else state
    from pathtracker_tpu.train import torch_import

    if torch_import.looks_like_torch_state_dict(params):
        if template is None:
            raise ValueError(
                "a reference torch checkpoint needs a parameter template to "
                "import into; load through engine.load_ckpt/init_model")
        if torch_import.looks_like_tsm_resnet_state_dict(params):
            # 2-D torchvision-resnet trunk: the reference's resnet_TSM
            # (rntsm) or a plain ImageNet resnet (bare conv1/bn1/layerL.B)
            return torch_import.import_tsm_resnet_state_dict(
                params, template, strict=strict)
        if any(k.split("module.")[-1].startswith(("stem.", "layer1."))
               for k in params):
            # torchvision-layout video resnet (the reference's
            # nostridetv/r3d family keeps torchvision naming)
            return torch_import.import_video_resnet_state_dict(
                params, template, strict=strict)
        if torch_import.looks_like_slowfast_state_dict(params):
            # FAIR pyslowfast layout (the reference's slowfast/slowfast_nl)
            return torch_import.import_slowfast_state_dict(
                params, template, strict=strict)
        return torch_import.import_reference_state_dict(
            params, template, strict=strict)
    if template is None:
        return params
    if strict:
        return serialization.from_state_dict(template, params)
    merged = _merge(dict(template) if isinstance(template, dict) else template, params)
    return merged


def _merge(template, loaded):
    if isinstance(template, dict) and isinstance(loaded, dict):
        return {k: _merge(template[k], loaded[k]) if k in loaded else template[k]
                for k in template}
    return loaded if loaded is not None else template


def find_best_checkpoint(results_folder: str) -> str:
    """val.npz balacc argmax, indexed into mtime-sorted saved_models/*.tar
    (reference test_model.py:59-64)."""
    perfs = np.load(os.path.join(results_folder, "val.npz"))["balacc"]
    arg_perf = int(np.argmax(perfs))
    weights = glob.glob(os.path.join(results_folder, "saved_models", "*.tar"))
    # The rolling last-epoch snapshot (train/loop.py) is not a best-val
    # checkpoint; it is always the newest file, so mtime-indexing would
    # otherwise pick it whenever the clamp fires.
    weights = [w for w in weights
               if os.path.basename(w) != "model_last_epoch_checkpoint.pth.tar"]
    weights.sort(key=os.path.getmtime)
    if not weights:
        raise FileNotFoundError(f"no checkpoints under {results_folder}/saved_models")
    # The reference indexed checkpoint files by val-epoch index; checkpoints
    # only exist for improving epochs, so clamp like the snapshot's data did.
    return weights[min(arg_perf, len(weights) - 1)]
