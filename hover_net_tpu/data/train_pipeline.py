"""Host training-data pipeline: .npy patches -> augmented device batches.

Capability parity with dataloader/train_loader.py (FileLoader) rebuilt
for JAX: a multiprocess worker pool maps (load .npy -> augment ->
HV-target gen) over a shuffled epoch order, and a double-buffering
prefetcher overlaps host work with device compute (`jax.device_put` of
batch k+1 while k computes) — replacing torch DataLoader workers +
pinned-memory copies.

Patch files are [H, W, 3+1(+1)] stacks: RGB, instance map(, type map) —
the format produced by cli/extract_patches.py (same as the reference's
extract_patches.py output).
"""

from __future__ import annotations

import glob
import os
from concurrent.futures import ProcessPoolExecutor
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from ..ops.targets import gen_targets
from ..utils.crops import cropping_center
from .augs import TrainAugmentor

_WORKER_STATE: dict = {}


def _worker_init(input_shape, mask_shape, mode, with_type, base_seed):
    pid_seed = (base_seed + os.getpid() * 7919) % (2**31)
    _WORKER_STATE["aug"] = TrainAugmentor(input_shape, mode=mode, seed=pid_seed)
    _WORKER_STATE["mask_shape"] = tuple(mask_shape)
    _WORKER_STATE["with_type"] = with_type


def _load_one(path: str) -> Dict[str, np.ndarray]:
    aug: TrainAugmentor = _WORKER_STATE["aug"]
    mask_shape = _WORKER_STATE["mask_shape"]
    with_type = _WORKER_STATE["with_type"]

    data = np.load(path)
    img = data[..., :3].astype(np.uint8)
    ann = data[..., 3:].astype(np.int32)

    img, ann = aug(img, ann)
    inst_map = ann[..., 0]
    # compact dtypes through worker IPC and host->HBM: uint8 img /
    # binary np_map are 4x smaller than float32/int32; the jitted step
    # casts on device (models/hovernet.py:139, train_parallel.py:71)
    sample = {"img": img}
    if with_type:
        sample["tp_map"] = cropping_center(
            ann[..., 1].copy(), mask_shape
        ).astype(np.int32)
    target = gen_targets(inst_map, mask_shape)
    sample["np_map"] = target["np_map"].astype(np.uint8)
    sample["hv_map"] = target["hv_map"].astype(np.float32)
    return sample


class PatchDataset:
    """Lists .npy patches from one or more directories (sorted order,
    like run_train.py:102-114)."""

    def __init__(self, dir_list: Sequence[str]):
        files: List[str] = []
        for d in dir_list:
            files.extend(glob.glob(f"{d}/*.npy"))
        files.sort()
        assert files, f"no .npy patches under {list(dir_list)}"
        self.files = files

    def __len__(self):
        return len(self.files)


class TrainLoader:
    """Epoch iterator yielding stacked host batches."""

    def __init__(self, dataset: PatchDataset, batch_size: int,
                 input_shape, mask_shape, mode: str = "train",
                 with_type: bool = False, num_workers: int = 8,
                 seed: int = 10, drop_last: Optional[bool] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.mode = mode
        self.with_type = with_type
        self.num_workers = 0 if num_workers is None else num_workers
        self.seed = seed
        self.epoch = 0
        self.drop_last = (mode == "train") if drop_last is None else drop_last
        self._init_args = (tuple(input_shape), tuple(mask_shape), mode,
                           with_type)
        self._pool = None
        if self.num_workers > 0:
            self._pool = ProcessPoolExecutor(
                self.num_workers, initializer=_worker_init,
                initargs=self._init_args + (seed,),
            )
        else:
            _worker_init(*self._init_args, seed)

    def steps_per_epoch(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng(self.seed + self.epoch)
        order = np.arange(len(self.dataset))
        if self.mode == "train":
            rng.shuffle(order)
        files = [self.dataset.files[i] for i in order]
        self.epoch += 1

        if self._pool is not None:
            sample_iter = self._pool.map(_load_one, files, chunksize=4)
        else:
            sample_iter = map(_load_one, files)

        batch: List[Dict[str, np.ndarray]] = []
        for sample in sample_iter:
            batch.append(sample)
            if len(batch) == self.batch_size:
                yield self._stack(batch)
                batch = []
        if batch and not self.drop_last:
            yield self._stack(batch)

    @staticmethod
    def _stack(batch):
        return {k: np.stack([s[k] for s in batch]) for k in batch[0]}

    def close(self):
        if self._pool is not None:
            self._pool.shutdown()


class PrefetchLoader:
    """Iterable wrapper: batches come out already device-put (sharded
    over `mesh`), with `buffer` batches in flight — host aug/IO and the
    host->HBM transfer of batch k+1 overlap the device compute of batch
    k. This is the double-buffering upgrade over the reference's
    pinned-memory DataLoader workers (run_train.py:124-131)."""

    def __init__(self, loader: TrainLoader, mesh=None, buffer: int = 2):
        self.loader = loader
        self.mesh = mesh
        self.buffer = buffer

    def __iter__(self):
        return device_prefetch(iter(self.loader), self.mesh, self.buffer)

    def __len__(self):
        return self.loader.steps_per_epoch()

    def steps_per_epoch(self):
        return self.loader.steps_per_epoch()

    def close(self):
        self.loader.close()


def device_prefetch(host_iter, mesh=None, buffer: int = 2):
    """Double-buffered host->device pipeline: device_put the next batch
    while the current one computes."""
    import collections

    import jax

    from ..parallel.mesh import shard_batch

    def put(b):
        if mesh is not None:
            return shard_batch(mesh, b)
        return jax.tree_util.tree_map(jax.device_put, b)

    queue = collections.deque()
    it = iter(host_iter)
    try:
        for _ in range(buffer):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out
