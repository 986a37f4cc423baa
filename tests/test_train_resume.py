"""Training resume: interrupted phase continues from its checkpoint;
completed phases are skipped."""

import json
import os

import numpy as np
import pytest

from hover_net_tpu.config import PhaseConfig, TrainConfig
from hover_net_tpu.train.manager import TrainManager
from test_train_e2e import make_patches


@pytest.mark.slow
def test_resume_continues_phase(tmp_path):
    rng = np.random.default_rng(0)
    train_dir = str(tmp_path / "train")
    valid_dir = str(tmp_path / "valid")
    make_patches(train_dir, 4, rng, with_type=False)
    make_patches(valid_dir, 2, rng, with_type=False)

    def cfg(nr_epochs):
        return TrainConfig(
            model_mode="fast", nr_types=None, type_classification=False,
            width=8, log_dir=str(tmp_path / "logs"),
            train_dir_list=[train_dir], valid_dir_list=[valid_dir],
            nr_procs_train=0, nr_procs_valid=0, debug=True,
            phases=[PhaseConfig(freeze_encoder=False, pretrained=None,
                                batch_size={"train": 2, "valid": 2},
                                nr_epochs=nr_epochs)],
            shape_override={"aug": (140, 140), "act": (96, 96), "out": (4, 4)},
        )

    # epoch 1 only (simulating an interruption of a 2-epoch phase)
    TrainManager(cfg(1), n_devices=1).run()
    assert os.path.exists(tmp_path / "logs" / "net_epoch=1.msgpack")

    # resume the (now 2-epoch) phase: must continue to epoch 2 and keep
    # epoch 1's stats entry
    TrainManager(cfg(2), n_devices=1).run(resume=True)
    assert os.path.exists(tmp_path / "logs" / "net_epoch=2.msgpack")
    with open(tmp_path / "logs" / "stats.json") as f:
        stats = json.load(f)
    assert "1" in stats and "2" in stats

    # resume again with everything complete: skips (no epoch 3 appears)
    TrainManager(cfg(2), n_devices=1).run(resume=True)
    assert not os.path.exists(tmp_path / "logs" / "net_epoch=3.msgpack")
