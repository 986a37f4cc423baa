"""Device mesh + sharding helpers.

HoVer-Net parallelism is batch data-parallelism over ICI — the TPU-native
replacement for the reference's single-process `torch.nn.DataParallel`
scatter/gather (run_train.py:218, infer/base.py:69). A 1-D 'data' mesh
axis covers train (grad psum by XLA) and inference (embarrassingly
parallel patch batches). The helpers keep a seam for richer meshes
(e.g. a future spatial axis for giant post-proc tiles).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        assert len(devices) >= n_devices, (
            f"need {n_devices} devices, have {len(devices)}"
        )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_map_compat(fn, mesh: Mesh, in_specs, out_specs):
    """shard_map across jax versions: prefer the stable jax.shard_map
    (v0.8+), fall back to jax.experimental; replica/VMA checking off —
    the WSI kernels carry scalar while_loop state and Pallas custom
    calls that the trackers reject."""
    try:
        sm = jax.shard_map
    except AttributeError:  # pre-0.8
        from jax.experimental.shard_map import shard_map as sm
    kw = {"mesh": mesh, "in_specs": in_specs, "out_specs": out_specs}
    try:
        return sm(fn, check_vma=False, **kw)
    except TypeError:  # older jax spells it check_rep
        return sm(fn, check_rep=False, **kw)


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """device_put a host batch pytree with the leading dim sharded."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
