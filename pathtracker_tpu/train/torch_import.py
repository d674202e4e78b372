"""Import reference PyTorch checkpoints into pathtracker_tpu parameter trees.

A reference user's trained artifacts are torch-pickle files
(`saved_models/model_val_acc_%04d_epoch_%02d_checkpoint.pth.tar`) holding
either a raw `state_dict` (reference utils/earlystopping.py:50-56) or a
`{'state_dict': ...}` wrapper (reference utils/misc_functions.py:72-80),
possibly with DataParallel's `module.` prefix. This module maps those onto
this framework's parameter trees so existing checkpoints keep working after
migration.

Covered: the reference-native recurrent family whose parameters this
framework deliberately names after the reference `state_dict` keys — InT and
its lesion variants, FFhGRU/FFhGRU_v2 (`hgru`/`hgru_v2`), ConvGRU (`gru`) —
i.e. exactly the models the reference's own `model_selector` could train and
checkpoint with `train_InT.sh`-style runs. Other families raise with the
list of unmapped keys.

Name mapping (reference -> here), verified against reference models/InT.py
and models/ffhgru_hierarchy.py / models/kys.py:

    preproc.weight               -> preproc_kernel      [C,3,1,1,1] -> [3,C]
    unit1.<gate>.weight          -> <gate>_kernel       [C,C,1,1]   -> [C,C]^T
    unit1.<gate>.bias            -> <gate>_bias
    unit1.conv_<g>.weight        -> conv_<g>_kernel     OIHW -> HWIO
    unit1.w_inh / w_exc          -> w_inh / w_exc       OIHW -> HWIO
    unit1.{alpha,mu,gamma,kappa,w} -> same              [C,1,1] -> [C]
    unit1.bn.<i>.{weight,bias}   -> bn<i>_{scale,bias}
    readout_conv.weight          -> readout_conv_kernel [1,C,1,1] -> [C,1]
    target_conv.weight           -> target_conv_kernel  OIHW -> HWIO
    readout_dense.weight         -> readout_dense_kernel [out,in] -> [in,out]

Layout transforms are derived from (source shape, template shape), so the
same rules cover every conv/dense in the family.
"""

from __future__ import annotations

import re

import numpy as np

# Reference modules that exist in checkpoints but are unused by the
# reference's own forward pass (e.g. FFhGRU's wrapper-level BatchNorm3d
# `self.bn`, reference ffhgru_hierarchy.py:186 — defined, never called).
# They have no counterpart here; drop them silently.
_UNUSED_REFERENCE_KEYS = re.compile(r"^bn\.(weight|bias)$")

_NAME_RULES = [
    (re.compile(r"^preproc\.weight$"), lambda m: "preproc_kernel"),
    (re.compile(r"^preproc\.bias$"), lambda m: "preproc_bias"),
    # ConvLSTM (reference models/convlstm.py:104-115): trainable Gabor stem,
    # wrapper BN (real there, unlike FFhGRU's dead one), 1x1 conv6 head.
    (re.compile(r"^conv0\.weight$"), lambda m: "conv0_kernel"),
    (re.compile(r"^conv0\.bias$"), lambda m: "conv0_bias"),
    (re.compile(r"^conv6\.weight$"), lambda m: "conv6_kernel"),
    (re.compile(r"^conv6\.bias$"), lambda m: "conv6_bias"),
    (re.compile(r"^bn\.weight$"), lambda m: "bn_scale"),
    (re.compile(r"^bn\.bias$"), lambda m: "bn_bias"),
    (re.compile(r"^unit1\.bn\.(\d+)\.weight$"), lambda m: f"bn{m.group(1)}_scale"),
    (re.compile(r"^unit1\.bn\.(\d+)\.bias$"), lambda m: f"bn{m.group(1)}_bias"),
    (re.compile(r"^unit1\.([A-Za-z_0-9]+)\.weight$"), lambda m: f"{m.group(1)}_kernel"),
    (re.compile(r"^unit1\.([A-Za-z_0-9]+)\.bias$"), lambda m: f"{m.group(1)}_bias"),
    (re.compile(r"^unit1\.([A-Za-z_0-9]+)$"), lambda m: m.group(1)),
    (re.compile(r"^readout_conv\.weight$"), lambda m: "readout_conv_kernel"),
    (re.compile(r"^readout_conv\.bias$"), lambda m: "readout_conv_bias"),
    (re.compile(r"^target_conv\.weight$"), lambda m: "target_conv_kernel"),
    (re.compile(r"^target_conv\.bias$"), lambda m: "target_conv_bias"),
    (re.compile(r"^readout_dense\.weight$"), lambda m: "readout_dense_kernel"),
    (re.compile(r"^readout_dense\.bias$"), lambda m: "readout_dense_bias"),
]


def _map_name(key: str) -> str | None:
    for pattern, fn in _NAME_RULES:
        m = pattern.match(key)
        if m:
            return fn(m)
    return None


def _to_layout(value: np.ndarray, target_shape: tuple) -> np.ndarray:
    """Convert a torch-layout tensor to this framework's layout, inferred
    from the two shapes."""
    src = value
    if src.ndim == 5 and len(target_shape) == 2:
        # Conv3d 1x1x1 [O,I,1,1,1] -> matmul [I,O]
        src = src[:, :, 0, 0, 0].T
    elif src.ndim == 4 and len(target_shape) == 2:
        # Conv2d 1x1 [O,I,1,1] -> matmul [I,O]
        src = src[:, :, 0, 0].T
    elif src.ndim == 4 and len(target_shape) == 4:
        # OIHW -> HWIO
        src = src.transpose(2, 3, 1, 0)
    elif src.ndim == 3 and len(target_shape) == 1:
        # per-channel scalars [C,1,1] -> [C]
        src = src.reshape(-1)
    elif src.ndim == 2 and len(target_shape) == 2:
        # torch Linear [out,in] -> [in,out]
        src = src.T
    if tuple(src.shape) != tuple(target_shape):
        raise ValueError(
            f"cannot map torch tensor of shape {tuple(value.shape)} onto "
            f"parameter of shape {tuple(target_shape)}")
    return np.ascontiguousarray(src)


def looks_like_torch_state_dict(params) -> bool:
    """Heuristic: reference state_dicts use dotted module paths."""
    return isinstance(params, dict) and any(
        isinstance(k, str) and "." in k for k in params)


def import_reference_state_dict(state_dict: dict, template: dict,
                                strict: bool = True) -> dict:
    """Map a reference torch `state_dict` onto `template` (a flat
    {name: array} params dict as produced by the recurrent family's init).

    strict=True requires every template parameter to be filled; strict=False
    keeps template values for absent keys (the reference viz script's
    load_ckpt(strict=False) semantics).
    """
    out = dict(template)
    filled = set()
    unmapped = []
    for key, value in state_dict.items():
        if key.startswith("module."):  # DataParallel prefix
            key = key[len("module."):]
        name = _map_name(key)
        if name is None or name not in template:
            # bn.* maps to bn_scale/bn_bias where the model has a wrapper
            # BN (ConvLSTM); FFhGRU's wrapper BN is defined-but-dead in
            # the reference (ffhgru_hierarchy.py:186) and has no
            # counterpart here — drop it only when the template lacks it.
            if _UNUSED_REFERENCE_KEYS.match(key):
                continue
            unmapped.append(key)
            continue
        arr = np.asarray(
            value.detach().cpu().numpy() if hasattr(value, "detach") else value,
            dtype=np.float32)
        out[name] = _to_layout(arr, np.shape(template[name]))
        filled.add(name)
    if unmapped:
        raise ValueError(
            "torch checkpoint contains keys with no counterpart here "
            f"(model family not covered by the importer?): {sorted(unmapped)}")
    missing = set(template) - filled
    if strict and missing:
        raise ValueError(
            f"torch checkpoint is missing parameters: {sorted(missing)} "
            "(pass strict=False to keep initialized values for these)")
    return out


_BN_STATS = re.compile(r"\.(running_mean|running_var|num_batches_tracked)$")


def _deep_copy_tree(template: dict) -> dict:
    """Copy the dict structure (leaves shared) so filling imported values
    never mutates the caller's template pytree."""
    return {k: _deep_copy_tree(v) if isinstance(v, dict) else v
            for k, v in template.items()}


def _import_by_paths(state_dict: dict, template: dict, path_fn, transpose_fn,
                     head_prefixes: tuple, what: str,
                     strict: bool = True) -> dict:
    """Shared importer scaffold for the torch-layout checkpoint mappers.

    For each state_dict entry: strip a DataParallel ``module.`` prefix,
    drop BatchNorm running statistics (batch-stat norms by design), walk
    ``path_fn(key)`` into the nested ``template``, convert via
    ``transpose_fn``, and fill the leaf. A class head whose shape doesn't
    match the template (Kinetics/ImageNet heads vs our 1-unit readout —
    ``path[0]`` starting with any of ``head_prefixes``) is skipped, as the
    reference replaced heads after loading too. Unmapped keys raise; under
    ``strict`` any unfilled non-head template parameter raises."""
    out = _deep_copy_tree(template)
    filled = set()
    unmapped = []
    for key, value in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        if _BN_STATS.search(key):
            continue
        path = path_fn(key)
        if path is None:
            unmapped.append(key)
            continue
        node, tnode = out, template
        ok = True
        for p in path[:-1]:
            if not isinstance(tnode, dict) or p not in tnode:
                ok = False
                break
            node, tnode = node[p], tnode[p]
        if not ok or not isinstance(tnode, dict) or path[-1] not in tnode:
            unmapped.append(key)
            continue
        arr = np.asarray(
            value.detach().cpu().numpy() if hasattr(value, "detach") else value,
            dtype=np.float32)
        arr = transpose_fn(arr)
        tshape = tuple(np.shape(tnode[path[-1]]))
        if tuple(arr.shape) != tshape:
            if path[0].startswith(head_prefixes):
                continue
            raise ValueError(
                f"cannot map {key} of shape {tuple(np.shape(value))} onto "
                f"parameter {'/'.join(path)} of shape {tshape}")
        node[path[-1]] = np.ascontiguousarray(arr)
        filled.add("/".join(path))
    if unmapped:
        raise ValueError(
            f"{what} checkpoint contains unmapped keys: {sorted(unmapped)}")
    if strict:
        def _missing(tmpl, prefix):
            miss = []
            for k, v in tmpl.items():
                p = f"{prefix}/{k}" if prefix else k
                if isinstance(v, dict):
                    miss += _missing(v, p)
                elif p not in filled and not p.startswith(head_prefixes):
                    miss.append(p)
            return miss

        missing = _missing(template, "")
        if missing:
            raise ValueError(
                f"{what} checkpoint is missing parameters: {sorted(missing)}")
    return out


def import_video_resnet_state_dict(state_dict: dict, template: dict,
                                   strict: bool = True) -> dict:
    """Map a torchvision-layout video-resnet `state_dict` (the reference's
    r3d_18/mc3_18/r2plus1d_18 forks keep torchvision naming — reference
    models/nostridetv.py:193-349) onto models/video_resnet.py's nested params.

    Torchvision name -> here:
        stem.0.weight                 -> stem/kernel          (OITHW -> THWIO)
        stem.1.{weight,bias}          -> stem/bn_{scale,bias}
        stem.{0,1,3,4}.* (r2plus1)    -> stem_s/*, stem_t/*
        layerL.B.convI.0.weight       -> layerL_B/convI/kernel
        layerL.B.convI.0.{0,1,3}.*    -> layerL_B/convI/{kernel_s,bn_*,kernel_t}
        layerL.B.convI.1.{weight,bias}-> layerL_B/bnI_{scale,bias}
        layerL.B.downsample.{0,1}.*   -> layerL_B/{ds_kernel,ds_bn_*}
        fc.{weight,bias}              -> fc_{kernel,bias}

    BatchNorm running statistics are dropped: this framework's norms are
    batch-stat by design (track_running_stats=False stance). A Kinetics
    400-class `fc` that does not match a 1-unit template head is skipped —
    the reference replaced the head after loading too (reference
    utils/engine.py:188-190)."""
    r2plus1 = any(k.endswith("stem.3.weight") for k in state_dict)

    def _path(key: str):
        m = re.match(r"^stem\.(\d+)\.(weight|bias)$", key)
        if m:
            idx, leaf = int(m.group(1)), m.group(2)
            if r2plus1:
                mod = {0: ("stem_s", "kernel"), 1: ("stem_s", "bn"),
                       3: ("stem_t", "kernel"), 4: ("stem_t", "bn")}[idx]
            else:
                mod = {0: ("stem", "kernel"), 1: ("stem", "bn")}[idx]
            name, kind = mod
            if kind == "kernel":
                return (name, "kernel")
            return (name, "bn_scale" if leaf == "weight" else "bn_bias")
        m = re.match(r"^layer(\d+)\.(\d+)\.conv([12])\.0\.weight$", key)
        if m:
            return (f"layer{m.group(1)}_{m.group(2)}", f"conv{m.group(3)}",
                    "kernel")
        m = re.match(r"^layer(\d+)\.(\d+)\.conv([12])\.0\.(\d+)\.(weight|bias)$",
                     key)
        if m:
            blk = f"layer{m.group(1)}_{m.group(2)}"
            conv = f"conv{m.group(3)}"
            sub, leaf = int(m.group(4)), m.group(5)
            if sub == 0:
                return (blk, conv, "kernel_s")
            if sub == 1:
                return (blk, conv, "bn_scale" if leaf == "weight" else "bn_bias")
            if sub == 3:
                return (blk, conv, "kernel_t")
        m = re.match(r"^layer(\d+)\.(\d+)\.conv([12])\.1\.(weight|bias)$", key)
        if m:
            return (f"layer{m.group(1)}_{m.group(2)}",
                    f"bn{m.group(3)}_scale" if m.group(4) == "weight"
                    else f"bn{m.group(3)}_bias")
        m = re.match(r"^layer(\d+)\.(\d+)\.downsample\.0\.weight$", key)
        if m:
            return (f"layer{m.group(1)}_{m.group(2)}", "ds_kernel")
        m = re.match(r"^layer(\d+)\.(\d+)\.downsample\.1\.(weight|bias)$", key)
        if m:
            return (f"layer{m.group(1)}_{m.group(2)}",
                    "ds_bn_scale" if m.group(3) == "weight" else "ds_bn_bias")
        if key == "fc.weight":
            return ("fc_kernel",)
        if key == "fc.bias":
            return ("fc_bias",)
        return None

    def _tr(arr):
        if arr.ndim == 5:
            return arr.transpose(2, 3, 4, 1, 0)  # OITHW -> THWIO
        if arr.ndim == 2:
            return arr.T  # torch Linear [out,in] -> [in,out]
        return arr

    return _import_by_paths(state_dict, template, _path, _tr, ("fc_",),
                            "torchvision", strict)


def load_torch_checkpoint(path: str):
    """torch.load a reference checkpoint file; returns the raw object
    (state_dict or wrapper dict) with tensors on CPU."""
    import torch

    return torch.load(path, map_location="cpu")


# --- TSM-ResNet: reference resnet_TSM / torchvision-resnet layout -----------

# The reference's rntsm is a 2-D torchvision-style ResNet with TSM shifts
# and MotionSqueeze (reference models/resnet_TSM.py:233-330): trunk keys
# conv1/bn1/layerL.B.{convI,bnI,downsample.{0,1}}, plus
# chnl_reduction.{0,1} (conv+BN Sequential, :257-261),
# flow_refinement.convN.{0,1,3,4} (dw-conv,BN,pw-conv,BN per stage,
# :180-212), and the Conv1d head fc1 (:269). Plain ImageNet torchvision
# resnet state_dicts (the `model_urls` weights the reference downloaded)
# share the trunk naming and import the same way with strict=False.


def looks_like_tsm_resnet_state_dict(state_dict) -> bool:
    keys = {k.split("module.")[-1] for k in state_dict
            if isinstance(k, str)}
    return ("conv1.weight" in keys
            and any(k.startswith("layer1.0.conv1.weight") for k in keys))


def _tsm_path(key: str):
    def bn_leaf(leaf):
        return "bn_scale" if leaf == "weight" else "bn_bias"

    if key == "conv1.weight":
        return ("stem", "kernel")
    m = re.match(r"^bn1\.(weight|bias)$", key)
    if m:
        return ("stem", bn_leaf(m.group(1)))
    m = re.match(r"^layer(\d)\.(\d+)\.conv(\d)\.weight$", key)
    if m:
        return (f"layer{m.group(1)}_{m.group(2)}", f"conv{m.group(3)}",
                "kernel")
    m = re.match(r"^layer(\d)\.(\d+)\.bn(\d)\.(weight|bias)$", key)
    if m:
        return (f"layer{m.group(1)}_{m.group(2)}", f"conv{m.group(3)}",
                bn_leaf(m.group(4)))
    m = re.match(r"^layer(\d)\.(\d+)\.downsample\.0\.weight$", key)
    if m:
        return (f"layer{m.group(1)}_{m.group(2)}", "down", "kernel")
    m = re.match(r"^layer(\d)\.(\d+)\.downsample\.1\.(weight|bias)$", key)
    if m:
        return (f"layer{m.group(1)}_{m.group(2)}", "down", bn_leaf(m.group(3)))
    if key == "chnl_reduction.0.weight":
        return ("chnl_reduction", "kernel")
    m = re.match(r"^chnl_reduction\.1\.(weight|bias)$", key)
    if m:
        return ("chnl_reduction", bn_leaf(m.group(1)))
    m = re.match(r"^flow_refinement\.conv(\d)\.([0134])\.(weight|bias)$", key)
    if m:
        n, sub, leaf = m.group(1), int(m.group(2)), m.group(3)
        mod = f"dw{n}" if sub in (0, 1) else f"pw{n}"
        if sub in (0, 3):
            return ("flow_refinement", mod, "kernel")
        return ("flow_refinement", mod, bn_leaf(leaf))
    if key in ("fc1.weight", "fc.weight"):
        return ("fc1_kernel",)
    if key in ("fc1.bias", "fc.bias"):
        return ("fc1_bias",)
    return None


def import_tsm_resnet_state_dict(state_dict: dict, template: dict,
                                 strict: bool = True) -> dict:
    """Map a reference resnet_TSM (or plain torchvision resnet) state_dict
    onto models/tsm_resnet.py's nested params. Conv weights transpose
    OIHW -> HWIO (grouped dw convs keep [k,k,1,C] <-> [C,1,k,k]); the
    Conv1d head fc1 [cls,C,1] maps to the dense [C,cls]; an ImageNet
    1000-class fc that doesn't match the template head is skipped. BN
    running statistics are dropped (batch-stat norms by design). Use
    strict=False for ImageNet trunks, which lack the MotionSqueeze and
    head parameters."""
    def _tr(arr):
        if arr.ndim == 4:
            return arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        if arr.ndim == 3:  # Conv1d head [cls, C, 1]
            return arr[..., 0].T
        if arr.ndim == 2:  # Linear fc [cls, C]
            return arr.T
        return arr

    return _import_by_paths(state_dict, template, _tsm_path, _tr, ("fc1_",),
                            "TSM/resnet", strict)


def export_tsm_resnet_state_dict(params: dict) -> dict:
    """Inverse mapping: models/tsm_resnet.py params -> reference resnet_TSM
    state_dict naming (torchvision trunk + MotionSqueeze modules + the
    Conv1d head)."""
    import torch

    def emit(out, key, arr, conv1d=False):
        arr = np.asarray(arr, np.float32)
        if conv1d:
            arr = arr.T[..., None]  # [C,cls] -> [cls,C,1]
        elif arr.ndim == 4:
            arr = arr.transpose(3, 2, 0, 1)  # HWIO -> OIHW
        out[key] = torch.from_numpy(np.ascontiguousarray(arr))

    def emit_convbn(out, base_conv, base_bn, mod):
        emit(out, base_conv, mod["kernel"])
        emit(out, f"{base_bn}.weight", mod["bn_scale"])
        emit(out, f"{base_bn}.bias", mod["bn_bias"])

    out = {}
    for name, value in params.items():
        if name == "stem":
            emit_convbn(out, "conv1.weight", "bn1", value)
            continue
        if name == "fc1_kernel":
            emit(out, "fc1.weight", value, conv1d=True)
            continue
        if name == "fc1_bias":
            emit(out, "fc1.bias", value)
            continue
        if name == "chnl_reduction":
            emit_convbn(out, "chnl_reduction.0.weight", "chnl_reduction.1",
                        value)
            continue
        if name == "flow_refinement":
            for n in "1234":
                emit_convbn(out, f"flow_refinement.conv{n}.0.weight",
                            f"flow_refinement.conv{n}.1", value[f"dw{n}"])
                emit_convbn(out, f"flow_refinement.conv{n}.3.weight",
                            f"flow_refinement.conv{n}.4", value[f"pw{n}"])
            continue
        m = re.match(r"^layer(\d)_(\d+)$", name)
        if m:
            base = f"layer{m.group(1)}.{m.group(2)}"
            for sub, mod in value.items():
                cm = re.match(r"^conv(\d)$", sub)
                if cm:
                    emit_convbn(out, f"{base}.conv{cm.group(1)}.weight",
                                f"{base}.bn{cm.group(1)}", mod)
                elif sub == "down":
                    emit_convbn(out, f"{base}.downsample.0.weight",
                                f"{base}.downsample.1", mod)
                else:
                    raise ValueError(f"unknown block member {name}/{sub}")
            continue
        raise ValueError(f"no resnet_TSM counterpart for {name!r}")
    return out


# --- SlowFast: FAIR pyslowfast layout <-> models/slowfast.py ----------------

# The reference built FAIR's SlowFast (reference models/slowfast_utils.py:13)
# whose state_dict uses the pyslowfast module naming:
#   s1.pathway{0,1}_stem.{conv.weight, bn.weight/bias/running_*}
#   s{j}_fuse.{conv_f2s.weight, bn.*}                      j in 1..4
#   s{j}.pathway{p}_res{b}.branch1{,_bn}.*                 (projection)
#   s{j}.pathway{p}_res{b}.branch2.{a,b,c}{,_bn}.*         j in 2..5
#   s{j}.pathway0_nonlocal{b}.{conv_theta,conv_phi,conv_g,conv_out,bn}.*
#   head.projection.{weight,bias}
# pathway0 = slow, pathway1 = fast; FAIR convs carry no bias.


def looks_like_slowfast_state_dict(state_dict) -> bool:
    return isinstance(state_dict, dict) and any(
        isinstance(k, str) and "pathway" in k.split("module.")[-1]
        for k in state_dict)


def _slowfast_path(key: str):
    """FAIR key -> path into models/slowfast.py's nested params (or None)."""
    def bn_leaf(leaf):
        return "bn_scale" if leaf == "weight" else "bn_bias"

    m = re.match(r"^s1\.pathway([01])_stem\.conv\.weight$", key)
    if m:
        return (("slow_stem", "fast_stem")[int(m.group(1))], "kernel")
    m = re.match(r"^s1\.pathway([01])_stem\.bn\.(weight|bias)$", key)
    if m:
        return (("slow_stem", "fast_stem")[int(m.group(1))],
                bn_leaf(m.group(2)))
    m = re.match(r"^s(\d)_fuse\.conv_f2s\.weight$", key)
    if m:
        return (f"fuse{int(m.group(1)) - 1}", "kernel")
    m = re.match(r"^s(\d)_fuse\.bn\.(weight|bias)$", key)
    if m:
        return (f"fuse{int(m.group(1)) - 1}", bn_leaf(m.group(2)))
    m = re.match(r"^s(\d)\.pathway([01])_res(\d+)\.branch1\.weight$", key)
    if m:
        pw = ("slow", "fast")[int(m.group(2))]
        return (f"{pw}_res{m.group(1)}_{m.group(3)}", "proj", "kernel")
    m = re.match(r"^s(\d)\.pathway([01])_res(\d+)\.branch1_bn\.(weight|bias)$",
                 key)
    if m:
        pw = ("slow", "fast")[int(m.group(2))]
        return (f"{pw}_res{m.group(1)}_{m.group(3)}", "proj",
                bn_leaf(m.group(4)))
    m = re.match(r"^s(\d)\.pathway([01])_res(\d+)\.branch2\.([abc])\.weight$",
                 key)
    if m:
        pw = ("slow", "fast")[int(m.group(2))]
        return (f"{pw}_res{m.group(1)}_{m.group(3)}", m.group(4), "kernel")
    m = re.match(
        r"^s(\d)\.pathway([01])_res(\d+)\.branch2\.([abc])_bn\.(weight|bias)$",
        key)
    if m:
        pw = ("slow", "fast")[int(m.group(2))]
        return (f"{pw}_res{m.group(1)}_{m.group(3)}", m.group(4),
                bn_leaf(m.group(5)))
    m = re.match(r"^s(\d)\.pathway0_nonlocal(\d+)\.conv_(theta|phi|g)\.weight$",
                 key)
    if m:
        return (f"nl_res{m.group(1)}_{m.group(2)}", m.group(3), "kernel")
    m = re.match(r"^s(\d)\.pathway0_nonlocal(\d+)\.conv_out\.weight$", key)
    if m:
        return (f"nl_res{m.group(1)}_{m.group(2)}", "out", "kernel")
    m = re.match(r"^s(\d)\.pathway0_nonlocal(\d+)\.bn\.(weight|bias)$", key)
    if m:
        return (f"nl_res{m.group(1)}_{m.group(2)}", "out",
                bn_leaf(m.group(3)))
    if key == "head.projection.weight":
        return ("head_kernel",)
    if key == "head.projection.bias":
        return ("head_bias",)
    return None


def import_slowfast_state_dict(state_dict: dict, template: dict,
                               strict: bool = True) -> dict:
    """Map a FAIR pyslowfast state_dict (the reference's trained slowfast /
    slowfast_nl checkpoints) onto models/slowfast.py's nested params.

    Conv weights transpose OITHW -> THWIO; the head transposes
    [classes, feat] -> [feat, classes] (pathway concat order slow-then-fast
    matches FAIR's head_helper). BN running statistics are dropped
    (batch-stat norms by design); a Kinetics 400-class head that doesn't
    match a 1-unit template is skipped, as the reference replaced heads
    after loading too."""
    def _tr(arr):
        if arr.ndim == 5:
            return arr.transpose(2, 3, 4, 1, 0)  # OITHW -> THWIO
        if arr.ndim == 2:
            return arr.T
        return arr

    return _import_by_paths(state_dict, template, _slowfast_path, _tr,
                            ("head_",), "slowfast", strict)


def export_slowfast_state_dict(params: dict) -> dict:
    """Inverse mapping: models/slowfast.py params -> FAIR pyslowfast
    state_dict naming, so checkpoints trained here can be loaded by the
    reference's own slowfast stack (or round-tripped as a mapping test)."""
    import torch

    def emit(out, key, arr):
        arr = np.asarray(arr, np.float32)
        if arr.ndim == 5:
            arr = arr.transpose(4, 3, 0, 1, 2)  # THWIO -> OITHW
        elif arr.ndim == 2:
            arr = arr.T
        out[key] = torch.from_numpy(np.ascontiguousarray(arr))

    out = {}
    for name, value in params.items():
        if name == "head_kernel":
            emit(out, "head.projection.weight", value)
            continue
        if name == "head_bias":
            emit(out, "head.projection.bias", value)
            continue
        m = re.match(r"^(slow|fast)_stem$", name)
        if m:
            pw = 0 if m.group(1) == "slow" else 1
            emit(out, f"s1.pathway{pw}_stem.conv.weight", value["kernel"])
            emit(out, f"s1.pathway{pw}_stem.bn.weight", value["bn_scale"])
            emit(out, f"s1.pathway{pw}_stem.bn.bias", value["bn_bias"])
            continue
        m = re.match(r"^fuse(\d)$", name)
        if m:
            j = int(m.group(1)) + 1
            emit(out, f"s{j}_fuse.conv_f2s.weight", value["kernel"])
            emit(out, f"s{j}_fuse.bn.weight", value["bn_scale"])
            emit(out, f"s{j}_fuse.bn.bias", value["bn_bias"])
            continue
        m = re.match(r"^(slow|fast)_res(\d)_(\d+)$", name)
        if m:
            pw = 0 if m.group(1) == "slow" else 1
            base = f"s{m.group(2)}.pathway{pw}_res{m.group(3)}"
            for branch in ("a", "b", "c"):
                emit(out, f"{base}.branch2.{branch}.weight",
                     value[branch]["kernel"])
                emit(out, f"{base}.branch2.{branch}_bn.weight",
                     value[branch]["bn_scale"])
                emit(out, f"{base}.branch2.{branch}_bn.bias",
                     value[branch]["bn_bias"])
            if "proj" in value:
                emit(out, f"{base}.branch1.weight", value["proj"]["kernel"])
                emit(out, f"{base}.branch1_bn.weight",
                     value["proj"]["bn_scale"])
                emit(out, f"{base}.branch1_bn.bias", value["proj"]["bn_bias"])
            continue
        m = re.match(r"^nl_res(\d)_(\d+)$", name)
        if m:
            base = f"s{m.group(1)}.pathway0_nonlocal{m.group(2)}"
            for mod in ("theta", "phi", "g"):
                emit(out, f"{base}.conv_{mod}.weight", value[mod]["kernel"])
            emit(out, f"{base}.conv_out.weight", value["out"]["kernel"])
            emit(out, f"{base}.bn.weight", value["out"]["bn_scale"])
            emit(out, f"{base}.bn.bias", value["out"]["bn_bias"])
            continue
        raise ValueError(f"no FAIR slowfast counterpart for {name!r}")
    return out


# --- export: this framework -> reference torch layout -----------------------

_EXPORT_RULES = [
    (re.compile(r"^preproc_kernel$"), lambda m: "preproc.weight"),
    (re.compile(r"^preproc_bias$"), lambda m: "preproc.bias"),
    (re.compile(r"^conv0_kernel$"), lambda m: "conv0.weight"),
    (re.compile(r"^conv0_bias$"), lambda m: "conv0.bias"),
    (re.compile(r"^conv6_kernel$"), lambda m: "conv6.weight"),
    (re.compile(r"^conv6_bias$"), lambda m: "conv6.bias"),
    (re.compile(r"^bn_scale$"), lambda m: "bn.weight"),
    (re.compile(r"^bn_bias$"), lambda m: "bn.bias"),
    (re.compile(r"^bn(\d+)_scale$"), lambda m: f"unit1.bn.{m.group(1)}.weight"),
    (re.compile(r"^bn(\d+)_bias$"), lambda m: f"unit1.bn.{m.group(1)}.bias"),
    (re.compile(r"^readout_conv_kernel$"), lambda m: "readout_conv.weight"),
    (re.compile(r"^readout_conv_bias$"), lambda m: "readout_conv.bias"),
    (re.compile(r"^target_conv_kernel$"), lambda m: "target_conv.weight"),
    (re.compile(r"^target_conv_bias$"), lambda m: "target_conv.bias"),
    (re.compile(r"^readout_dense_kernel$"), lambda m: "readout_dense.weight"),
    (re.compile(r"^readout_dense_bias$"), lambda m: "readout_dense.bias"),
    (re.compile(r"^(w_inh|w_exc|alpha|mu|gamma|kappa|w)$"),
     lambda m: f"unit1.{m.group(1)}"),
    (re.compile(r"^([A-Za-z_0-9]+)_kernel$"), lambda m: f"unit1.{m.group(1)}.weight"),
    (re.compile(r"^([A-Za-z_0-9]+)_bias$"), lambda m: f"unit1.{m.group(1)}.bias"),
]


def export_reference_state_dict(params: dict) -> dict:
    """Inverse of `import_reference_state_dict` for the same family: a flat
    params dict becomes a reference-layout torch state_dict, so checkpoints
    trained here can be inspected/evaluated with the reference's own code."""
    import torch

    out = {}
    for name, value in params.items():
        arr = np.asarray(value, dtype=np.float32)
        key = None
        for pattern, fn in _EXPORT_RULES:
            m = pattern.match(name)
            if m:
                key = fn(m)
                break
        if key is None:
            raise ValueError(f"no reference counterpart for parameter {name!r}")
        if key == "preproc.weight":
            arr = arr.T[:, :, None, None, None]  # [3,C] -> [C,3,1,1,1]
        elif key == "conv6.weight":
            arr = arr.T[:, :, None, None]  # [C,2] matmul -> [2,C,1,1] conv
        elif key == "readout_conv.weight" or (
                key.endswith(".weight") and key.startswith("unit1.")
                and arr.ndim == 2 and "dense" not in key):
            arr = arr.T[:, :, None, None]  # [I,O] matmul -> [O,I,1,1] conv
        elif key == "readout_dense.weight":
            arr = arr.T  # [in,out] -> [out,in]
        elif arr.ndim == 4:
            arr = arr.transpose(3, 2, 0, 1)  # HWIO -> OIHW
        elif key.startswith("unit1.") and arr.ndim == 1 and re.search(
                r"unit1\.(alpha|mu|gamma|kappa|w)$", key):
            arr = arr[:, None, None]  # [C] -> [C,1,1]
        out[key] = torch.from_numpy(np.ascontiguousarray(arr))
    return out
