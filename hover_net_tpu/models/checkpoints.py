"""Checkpoint I/O.

Native format: msgpack (flax.serialization) of {params, batch_stats} plus
a JSON sidecar with the model config — one file per phase/epoch, written
atomically.

Importer: converts reference PyTorch checkpoints (the `.tar` files whose
'desc' entry holds the state dict, run_train.py:196-203 /
infer/base.py:65-68) into our pytree via a deterministic name map built
from the module structure — the analog of the reference's
variables_tf2pytorch.csv converter, torch->JAX this time. Conv kernels
transpose OIHW -> HWIO.
"""

from __future__ import annotations

import os
import tempfile
from typing import Dict

import jax
import numpy as np
from flax import serialization
from flax import traverse_util

from .hovernet import HoVerNetConfig


# ---------------------------------------------------------------- native

def save_checkpoint(path: str, variables, extra: dict | None = None):
    """Atomic msgpack write of any pytree (tuples/namedtuples — e.g.
    optax states — go through flax's state-dict conversion)."""
    payload = {
        "variables": serialization.to_state_dict(
            jax.tree_util.tree_map(np.asarray, variables)
        ),
        "extra": extra or {},
    }
    data = serialization.msgpack_serialize(payload)
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_checkpoint(path: str, target=None):
    """Load a checkpoint; pass `target` (a template pytree, e.g.
    `tx.init(params)`) to restore non-dict structures like optax states."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    variables = payload["variables"]
    if target is not None:
        variables = serialization.from_state_dict(target, variables)
    return variables, payload.get("extra", {})


# ------------------------------------------------------------- torch map

def _bn_entries(torch_prefix, flax_path):
    return [
        (torch_prefix + ".weight", ("params",) + flax_path + ("scale",), None),
        (torch_prefix + ".bias", ("params",) + flax_path + ("bias",), None),
        (torch_prefix + ".running_mean", ("batch_stats",) + flax_path + ("mean",), None),
        (torch_prefix + ".running_var", ("batch_stats",) + flax_path + ("var",), None),
    ]


def _conv_entries(torch_prefix, flax_path, bias=False):
    rows = [(torch_prefix + ".weight", ("params",) + flax_path + ("kernel",), "OIHW")]
    if bias:
        rows.append((torch_prefix + ".bias", ("params",) + flax_path + ("bias",), None))
    return rows


def torch_name_map(cfg: HoVerNetConfig):
    """[(torch_key, flax_path_tuple, transform)] for every variable.

    torch keys follow the reference module tree (net_desc.py:27-99,
    net_utils.py): e.g. 'conv0./.weight', 'd1.units.0.preact/bn.weight',
    'decoder.np.u3.dense.units.3.conv1/bn.running_mean'.
    """
    rows = []
    rows += _conv_entries("conv0./", ("conv0", "conv"))
    rows += _bn_entries("conv0.bn", ("conv0", "bn"))

    res_counts = {"d0": 3, "d1": 4, "d2": 6, "d3": 3}
    for d, count in res_counts.items():
        for k in range(count):
            u = f"{d}.units.{k}"
            fu = (d, f"unit{k}")
            if k != 0:
                rows += _bn_entries(f"{u}.preact/bn", fu + ("preact_bn",))
            rows += _conv_entries(f"{u}.conv1", fu + ("conv1",))
            rows += _bn_entries(f"{u}.conv1/bn", fu + ("conv1_bn",))
            rows += _conv_entries(f"{u}.conv2", fu + ("conv2",))
            rows += _bn_entries(f"{u}.conv2/bn", fu + ("conv2_bn",))
            rows += _conv_entries(f"{u}.conv3", fu + ("conv3",))
        rows += _conv_entries(f"{d}.shortcut", (d, "shortcut"))
        rows += _bn_entries(f"{d}.blk_bna.bn", (d, "bn"))

    rows += _conv_entries("conv_bot", ("conv_bot",))

    dense_counts = {"u3": 8, "u2": 4}
    for branch in cfg.branches:
        b = f"decoder.{branch}"
        fb = f"decoder_{branch}"
        for lvl in ("u3", "u2"):
            rows += _conv_entries(f"{b}.{lvl}.conva", (fb, f"{lvl}_conva"))
            for k in range(dense_counts[lvl]):
                du = f"{b}.{lvl}.dense.units.{k}"
                fdu = (fb, f"{lvl}_dense", f"unit{k}")
                rows += _bn_entries(f"{du}.preact_bna/bn", fdu + ("preact_bn",))
                rows += _conv_entries(f"{du}.conv1", fdu + ("conv1",))
                rows += _bn_entries(f"{du}.conv1/bn", fdu + ("conv1_bn",))
                rows += _conv_entries(f"{du}.conv2", fdu + ("conv2",))
            rows += _bn_entries(f"{b}.{lvl}.dense.blk_bna.bn", (fb, f"{lvl}_dense", "bn"))
            rows += _conv_entries(f"{b}.{lvl}.convf", (fb, f"{lvl}_convf"))
        rows += _conv_entries(f"{b}.u1.conva", (fb, "u1_conva"))
        rows += _bn_entries(f"{b}.u0.bn", (fb, "u0_bn"))
        rows += _conv_entries(f"{b}.u0.conv", (fb, "u0_conv"), bias=True)
    return rows


def tf_name_map(cfg: HoVerNetConfig):
    """[(tf_key, flax_path)] following the original TensorFlow HoVer-Net
    variable naming (the rule behind the reference's 668-row
    variables_tf2pytorch.csv, generated instead of shipped; verified
    against that CSV in tests/test_checkpoints.py). TF kernels are HWIO —
    already Flax layout, so no transposes anywhere on this path."""

    def bn(tf_prefix, path):
        return [
            (f"{tf_prefix}/gamma:0", ("params",) + path + ("scale",)),
            (f"{tf_prefix}/beta:0", ("params",) + path + ("bias",)),
            (f"{tf_prefix}/mean/EMA:0", ("batch_stats",) + path + ("mean",)),
            (f"{tf_prefix}/variance/EMA:0", ("batch_stats",) + path + ("var",)),
        ]

    def conv(tf_key, path):
        return [(tf_key, ("params",) + path + ("kernel",))]

    rows = []
    rows += conv("conv0/W:0", ("conv0", "conv"))
    rows += bn("conv0/bn", ("conv0", "bn"))
    res_counts = (3, 4, 6, 3)
    for g, count in enumerate(res_counts):
        d = f"d{g}"
        for k in range(count):
            u = f"group{g}/block{k}"
            fu = (d, f"unit{k}")
            if k != 0:
                rows += bn(f"{u}/preact/bn", fu + ("preact_bn",))
            rows += conv(f"{u}/conv1/W:0", fu + ("conv1",))
            rows += bn(f"{u}/conv1/bn", fu + ("conv1_bn",))
            rows += conv(f"{u}/conv2/W:0", fu + ("conv2",))
            rows += bn(f"{u}/conv2/bn", fu + ("conv2_bn",))
            rows += conv(f"{u}/conv3/W:0", fu + ("conv3",))
        rows += conv(f"group{g}/block0/convshortcut/W:0", (d, "shortcut"))
        rows += bn(f"group{g}/bnlast/bn", (d, "bn"))
    rows += conv("conv_bot/W:0", ("conv_bot",))

    dense_counts = {"u3": 8, "u2": 4}
    for branch in cfg.branches:
        fb = f"decoder_{branch}"
        for lvl in ("u3", "u2"):
            rows += conv(f"{branch}/{lvl}/conva/W:0", (fb, f"{lvl}_conva"))
            for k in range(dense_counts[lvl]):
                du = f"{branch}/{lvl}/dense/blk/{k}"
                fdu = (fb, f"{lvl}_dense", f"unit{k}")
                rows += bn(f"{du}/preact_bna/bn", fdu + ("preact_bn",))
                rows += conv(f"{du}/conv1/W:0", fdu + ("conv1",))
                rows += bn(f"{du}/conv1/bn", fdu + ("conv1_bn",))
                rows += conv(f"{du}/conv2/W:0", fdu + ("conv2",))
            rows += bn(f"{branch}/{lvl}/dense/blk_bna/bn",
                       (fb, f"{lvl}_dense", "bn"))
            rows += conv(f"{branch}/{lvl}/convf/W:0", (fb, f"{lvl}_convf"))
        rows += conv(f"{branch}/u1/conva/W:0", (fb, "u1_conva"))
        rows += bn(f"preact_out_{branch}/bn", (fb, "u0_bn"))
        rows += conv(f"conv_out_{branch}/W:0", (fb, "u0_conv"))
        rows.append((f"conv_out_{branch}/b:0",
                     ("params", fb, "u0_conv", "bias")))
    return rows


# variables under these module tops constitute the encoder that ImageNet
# pretraining must fully cover (run_train.py:196-203 loads strict=False;
# we instead fail loudly on an incomplete encoder)
ENCODER_TOPS = ("conv0", "d0", "d1", "d2", "d3")


def load_pretrained_npz(path: str, cfg: HoVerNetConfig,
                        require_encoder: bool = True):
    """Import a `.npz` pretrained checkpoint (reference
    run_train.py:196-203, models/hovernet/opt.py:55).

    Accepts either naming style:
    - original TensorFlow preact-ResNet50 names
      (``group0/block0/conv1/W:0``; HWIO kernels, imported directly), or
    - torch state-dict names (``d0.units.0.conv1.weight``; OIHW kernels,
      transposed), with optional ``module.`` prefixes.

    Returns the partial {params, batch_stats} pytree of every mapped
    variable present in the file (merge with `merge_partial`). With
    `require_encoder`, raises KeyError unless conv0 + d0..d3 are fully
    covered — a phase-0 "pretrained" file that leaves encoder variables
    random is a silently broken recipe.
    """
    arrays = {}
    with np.load(path) as z:
        for k in z.files:
            key = k[len("module."):] if k.startswith("module.") else k
            arrays[key] = np.asarray(z[k])

    tf_style = any(k.endswith(":0") for k in arrays)
    if tf_style:
        rows = [(k, p, None) for k, p in tf_name_map(cfg)]
    else:
        rows = torch_name_map(cfg)

    flat, covered = {}, set()
    for key, flax_path, transform in rows:
        if key not in arrays:
            continue
        v = arrays[key]
        if transform == "OIHW":
            v = v.transpose(2, 3, 1, 0)
        flat[flax_path] = v
        covered.add(key)

    if require_encoder:
        missing = [key for key, p, _ in rows
                   if p[1] in ENCODER_TOPS and key not in covered]
        if missing:
            raise KeyError(
                f"pretrained npz {path} misses {len(missing)} encoder "
                f"variables, e.g. {missing[:5]}"
            )

    ignorable = tuple(
        k for k in arrays
        if k not in covered and (
            k.startswith("linear") or "upsample" in k
            or k.endswith("num_batches_tracked")
        )
    )
    unknown = sorted(set(arrays) - covered - set(ignorable))
    if unknown:
        print(f"pretrained npz: {len(unknown)} unmapped variables "
              f"ignored, e.g. {unknown[:5]}")
    return traverse_util.unflatten_dict(flat)


def import_torch_state_dict(state: Dict[str, np.ndarray], cfg: HoVerNetConfig):
    """torch state dict (numpy values, 'module.' prefixes stripped) ->
    {params, batch_stats} pytree."""
    flat = {}
    for torch_key, flax_path, transform in torch_name_map(cfg):
        if torch_key not in state:
            raise KeyError(f"missing torch key: {torch_key}")
        v = np.asarray(state[torch_key])
        if transform == "OIHW":
            v = v.transpose(2, 3, 1, 0)  # -> HWIO
        flat[flax_path] = v
    return traverse_util.unflatten_dict(flat)


def export_torch_state_dict(variables, cfg: HoVerNetConfig) -> Dict[str, np.ndarray]:
    """Inverse of `import_torch_state_dict`: our {params, batch_stats}
    pytree -> a reference-layout torch state dict (numpy values, no
    'module.' prefixes). Conv kernels transpose HWIO -> OIHW. Every
    reference variable must be present — the exported dict loads into
    `/root/reference`'s `create_model(...)` with strict=True."""
    flat = traverse_util.flatten_dict(
        serialization.to_state_dict(
            jax.tree_util.tree_map(np.asarray, variables)
        )
    )
    out = {}
    for torch_key, flax_path, transform in torch_name_map(cfg):
        if flax_path not in flat:
            raise KeyError(f"variables missing {flax_path} (-> {torch_key})")
        v = np.asarray(flat[flax_path])
        if transform == "OIHW":
            v = v.transpose(3, 2, 0, 1)  # HWIO -> OIHW
        out[torch_key] = v
    # the reference UpSample2x registers its constant ones(2,2) unpool
    # matrix as a buffer (net_utils.py:279-282), so strict state-dict
    # loads expect it
    out["upsample2x.unpool_mat"] = np.ones((2, 2), np.float32)
    return out


def save_torch_tar(path: str, variables, cfg: HoVerNetConfig,
                   data_parallel_prefix: bool = True):
    """Write a reference-format '.tar' checkpoint ({'desc': state_dict},
    run_train.py:196-203) loadable by the reference `run_infer.py` —
    the reverse converter of `load_torch_tar`, so models trained here
    can be evaluated (or resumed) in the reference framework."""
    import torch

    state = {
        ("module." + k if data_parallel_prefix else k): torch.from_numpy(
            np.array(v, order="C")  # fresh writable buffer for torch
        )
        for k, v in export_torch_state_dict(variables, cfg).items()
    }
    torch.save({"desc": state}, path)


def load_torch_tar(path: str, cfg: HoVerNetConfig):
    """Load a reference '.tar' checkpoint ('desc' entry) and convert.

    Strips the DataParallel 'module.' prefix (run_utils/utils.py:15-29).
    """
    import torch

    payload = torch.load(path, map_location="cpu")
    state = payload["desc"] if isinstance(payload, dict) and "desc" in payload else payload
    out = {}
    for k, v in state.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
    return import_torch_state_dict(out, cfg)
