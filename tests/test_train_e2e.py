"""End-to-end training smoke test: two tiny phases over synthetic
patches, exercising engine + callbacks + checkpointing + phase chaining
+ validation metrics."""

import glob
import json
import os

import numpy as np
import pytest

from hover_net_tpu.config import PhaseConfig, TrainConfig
from hover_net_tpu.train.manager import TrainManager, last_checkpoint


def make_patches(dirpath, n, rng, size=140, with_type=True):
    os.makedirs(dirpath, exist_ok=True)
    yy, xx = np.mgrid[:size, :size]
    for i in range(n):
        img = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        inst = np.zeros((size, size), np.int32)
        k = 1
        for _ in range(3):
            cy, cx = rng.integers(20, size - 20, 2)
            r = rng.integers(8, 14)
            m = ((yy - cy) ** 2 + (xx - cx) ** 2) <= r * r
            inst[m & (inst == 0)] = k
            k += 1
        chans = [img, inst[..., None]]
        if with_type:
            tp = np.where(inst > 0, (inst % 4) + 1, 0)
            chans.append(tp[..., None])
        np.save(f"{dirpath}/p{i}.npy",
                np.concatenate(chans, axis=-1).astype(np.int32))


@pytest.mark.slow
def test_two_phase_training(tmp_path):
    rng = np.random.default_rng(0)
    train_dir = str(tmp_path / "train")
    valid_dir = str(tmp_path / "valid")
    make_patches(train_dir, 4, rng)
    make_patches(valid_dir, 2, rng)

    phases = [
        PhaseConfig(freeze_encoder=True, pretrained=None,
                    batch_size={"train": 2, "valid": 2}, nr_epochs=1),
        PhaseConfig(freeze_encoder=False, pretrained=-1,
                    batch_size={"train": 2, "valid": 2}, nr_epochs=1),
    ]
    cfg = TrainConfig(
        model_mode="fast", nr_types=5, type_classification=True, width=8,
        log_dir=str(tmp_path / "logs"), train_dir_list=[train_dir],
        valid_dir_list=[valid_dir], nr_procs_train=0, nr_procs_valid=0,
        phases=phases, debug=True,
        shape_override={"aug": (140, 140), "act": (96, 96), "out": (4, 4)},
    )
    mgr = TrainManager(cfg, n_devices=2)
    mgr.run()

    for phase_idx in range(2):
        d = str(tmp_path / "logs" / f"{phase_idx:02d}")
        assert os.path.exists(f"{d}/net_epoch=1.msgpack"), d
        # ConditionalSaver (wired by default, unlike the reference)
        assert os.path.exists(f"{d}/net_best=[valid-np_dice].msgpack"), d
        with open(f"{d}/stats.json") as f:
            stats = json.load(f)
        assert "1" in stats
        keys = stats["1"]
        assert "train-overall_loss" in keys
        assert "valid-np_dice" in keys
        assert "valid-hv_mse" in keys
        assert any(k.startswith("valid-tp_dice") for k in keys)
    assert last_checkpoint(str(tmp_path / "logs" / "01")).endswith(
        "net_epoch=1.msgpack"
    )
