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
    (infer/base.py:80-94 contract)."""
    nuc = {}
    for inst_id, info in inst_info.items():
        entry = {}
        for k, v in info.items():
            entry[k] = v.tolist() if isinstance(v, np.ndarray) else v
        nuc[int(inst_id)] = entry
    with open(path, "w") as f:
        json.dump({"mag": mag, "nuc": nuc}, f)
    return nuc
