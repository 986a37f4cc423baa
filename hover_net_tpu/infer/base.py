"""Shared inference manager: model/checkpoint loading, type info, JSON.

Capability parity with infer/base.py:22-94 in the reference, re-based on
JAX: the model is a Flax module + variables pytree, the run step a
jit-compiled function, and checkpoints load from either our msgpack
format or reference PyTorch `.tar` files (auto-detected).
"""

from __future__ import annotations

import json
from typing import Optional

import jax
import numpy as np

from ..models.hovernet import HoVerNet, HoVerNetConfig
from ..models import checkpoints as ckpt
from .steps import make_infer_step


def load_type_info(path: Optional[str], nr_types: Optional[int]):
    """{type_id: (name, (r,g,b))} from type_info.json, with the same
    availability check and fallback palette as infer/base.py:32-53."""
    if nr_types is None:
        return {None: ("no label", (0, 0, 0))}
    if path is not None:
        with open(path) as f:
            raw = json.load(f)
        info = {int(k): (v[0], tuple(v[1])) for k, v in raw.items()}
        for k in range(nr_types):
            assert k in info, f"type_id={k} missing from {path}"
        return info
    import matplotlib.pyplot as plt

    cmap = plt.get_cmap("hot")
    colours = (cmap(np.arange(nr_types))[:, :3] * 255).astype(np.uint8)
    return {k: (str(k), tuple(int(c) for c in colours[k])) for k in range(nr_types)}


class InferManagerBase:
    def __init__(self, model_path: str, mode: str = "fast",
                 nr_types: Optional[int] = None, type_info_path: Optional[str] = None,
                 width: int = 64, dtype=None, batch_size: int = 32):
        import jax.numpy as jnp

        self.cfg = HoVerNetConfig(
            mode=mode, nr_types=nr_types, width=width,
            dtype=dtype or jnp.bfloat16,
        )
        self.model = HoVerNet(self.cfg)
        self.variables = self._load_variables(model_path)
        self.infer_step = make_infer_step(self.model)
        self.nr_types = nr_types
        self.batch_size = batch_size
        self.type_info = load_type_info(type_info_path, nr_types)

    def _load_variables(self, model_path: str):
        import jax

        if model_path.endswith((".tar", ".pth", ".pt")):
            variables = ckpt.load_torch_tar(model_path, self.cfg)
        else:
            variables, _ = ckpt.load_checkpoint(model_path)
            self._validate_variables(variables, model_path)
        # place on device ONCE: msgpack/torch loaders return host numpy
        # leaves, and jit would otherwise re-upload every leaf on every
        # dispatch (measured 2.7s vs 0.2s per 1k-tile through the
        # remote-dispatch tunnel)
        return jax.device_put(variables)

    def _validate_variables(self, variables, model_path):
        """Fail loudly on checkpoint/model structure mismatch (flax
        silently ignores extra subtrees, e.g. a typed checkpoint loaded
        without --nr_types)."""
        from flax import traverse_util

        expected = jax.eval_shape(
            lambda x: self.model.init(jax.random.PRNGKey(0), x, train=False),
            jax.ShapeDtypeStruct(
                (1, self.cfg.patch_input_shape,
                 self.cfg.patch_input_shape, self.cfg.input_ch),
                "float32",
            ),
        )
        want = set(traverse_util.flatten_dict(expected).keys())
        have = set(traverse_util.flatten_dict(variables).keys())
        missing = want - have
        extra = have - want
        if missing:
            raise ValueError(
                f"checkpoint {model_path} missing {len(missing)} variables "
                f"for mode={self.cfg.mode} nr_types={self.cfg.nr_types} "
                f"width={self.cfg.width}, e.g. "
                f"{['/'.join(k) for k in sorted(missing)[:3]]}"
            )
        if extra:
            raise ValueError(
                f"checkpoint {model_path} has {len(extra)} unexpected "
                f"variables (wrong --nr_types/--model_mode/--width?), e.g. "
                f"{['/'.join(k) for k in sorted(extra)[:3]]}"
            )

    def run_batches(self, patches, pad_to: Optional[int] = None):
        """Run the jitted step over [K, H, W, 3] patches in fixed-size
        batches (single compiled shape; tail batch padded)."""
        import jax.numpy as jnp

        bs = self.batch_size
        k = patches.shape[0]
        outs = []
        for i in range(0, k, bs):
            chunk = patches[i : i + bs]
            n = chunk.shape[0]
            if n < bs:
                pad = jnp.zeros((bs - n,) + tuple(chunk.shape[1:]), chunk.dtype)
                chunk = jnp.concatenate([chunk, pad], axis=0)
            out = self.infer_step(self.variables, chunk)
            outs.append(out[:n])
        return jnp.concatenate(outs, axis=0)


def save_json(path, inst_info, mag=None):
    """{mag, nuc: {id: {...}}} with ndarray -> list conversion
    (infer/base.py:80-94 contract).

    Entries matching the standard 5-field schema serialize through the
    native table emitter (ops/instance_table.emit_nuc_json) — json.dump
    of a 50k-nuclei dict costs ~5 s and would approach the whole <5 min
    WSI budget at north-star scale; the native pass is ~10x."""
    payload = _save_json_native(path, inst_info, mag)
    if payload is not None:
        return payload
    nuc = {}
    for inst_id, info in inst_info.items():
        entry = {}
        for k, v in info.items():
            entry[k] = v.tolist() if isinstance(v, np.ndarray) else v
        nuc[int(inst_id)] = entry
    with open(path, "w") as f:
        json.dump({"mag": mag, "nuc": nuc}, f)
    return nuc


_SCHEMA_KEYS = ("bbox", "centroid", "contour", "type_prob", "type")


def _save_json_native(path, inst_info, mag):
    """Pack the inst_info dict into flat tables and emit natively.
    Returns the nuc dict contract value (inst_info itself — callers only
    reuse it read-only) or None when the schema doesn't match / no
    native library (caller falls back to json.dump)."""
    from ..ops.instance_table import emit_nuc_json

    n = len(inst_info)
    ids = np.empty(n, np.int64)
    bbox = np.empty((n, 4), np.int64)
    centroid = np.empty((n, 2), np.float64)
    lens = np.empty(n + 1, np.int64)
    lens[0] = 0
    contours = []
    typed = None
    type_ids = np.empty(n, np.int32)
    type_probs = np.empty(n, np.float64)
    # validate the schema on the first entry only; the tight loop below
    # raises on any deviating entry and the caller falls back
    for info in inst_info.values():
        if tuple(info.keys()) != _SCHEMA_KEYS:
            return None
        b, c, ct = info["bbox"], info["centroid"], info["contour"]
        if not (isinstance(b, np.ndarray) and b.shape == (2, 2)
                and isinstance(c, np.ndarray) and c.shape == (2,)
                and isinstance(ct, np.ndarray) and ct.ndim == 2
                and ct.shape[1] == 2 and ct.dtype.kind in "iu"):
            return None
        typed = info["type"] is not None
        break
    try:
        if typed:
            for i, (inst_id, info) in enumerate(inst_info.items()):
                ids[i] = inst_id
                bbox[i] = info["bbox"].ravel()
                centroid[i] = info["centroid"]
                ct = info["contour"]
                lens[i + 1] = len(ct)
                contours.append(ct)
                type_ids[i] = info["type"]
                type_probs[i] = info["type_prob"]
        else:
            for i, (inst_id, info) in enumerate(inst_info.items()):
                if info["type"] is not None:
                    return None
                ids[i] = inst_id
                bbox[i] = info["bbox"].ravel()
                centroid[i] = info["centroid"]
                ct = info["contour"]
                lens[i + 1] = len(ct)
                contours.append(ct)
    except (KeyError, TypeError, ValueError):
        return None
    offs = np.cumsum(lens)
    pts = (np.concatenate(contours, axis=0) if contours
           else np.zeros((0, 2), np.int32))
    payload = emit_nuc_json(
        ids, bbox, centroid, offs, pts,
        type_ids if typed else None, type_probs if typed else None, mag,
    )
    if payload is None:
        return None
    with open(path, "wb") as f:
        f.write(payload)
    return inst_info
