"""CLI-level tests: extract_patches, compute_stats, tile inference CLI."""

import glob
import json
import os

import numpy as np
import pytest
import scipy.io as sio


def test_extract_patches_cli(tmp_path):
    import cv2

    from hover_net_tpu.cli.extract_patches import main

    img_dir = tmp_path / "imgs"
    ann_dir = tmp_path / "anns"
    out_dir = tmp_path / "patches"
    os.makedirs(img_dir)
    os.makedirs(ann_dir)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (400, 380, 3), dtype=np.uint8)
    inst = np.zeros((400, 380), np.int32)
    inst[50:80, 50:80] = 1
    tp = np.where(inst > 0, 2, 0)
    cv2.imwrite(str(img_dir / "a.png"), img)
    sio.savemat(str(ann_dir / "a.mat"), {"inst_map": inst, "type_map": tp})

    main([
        "--dataset", "consep", "--with_type",
        "--img_dir", str(img_dir), "--ann_dir", str(ann_dir),
        "--out_dir", str(out_dir), "--win_size", "270", "--step_size", "80",
    ])
    patches = sorted(glob.glob(f"{out_dir}/*.npy"))
    assert patches
    sample = np.load(patches[0])
    assert sample.shape == (270, 270, 5)  # RGB + inst + type


def test_compute_stats_cli(tmp_path, capsys):
    from hover_net_tpu.cli.compute_stats import main

    pred_dir = tmp_path / "pred"
    true_dir = tmp_path / "true"
    os.makedirs(pred_dir)
    os.makedirs(true_dir)
    inst = np.zeros((64, 64), np.int32)
    inst[10:20, 10:20] = 1
    inst[30:45, 30:45] = 2
    cent = np.array([[14.5, 14.5], [37.0, 37.0]])
    types = np.array([[1], [2]])
    for d in (pred_dir, true_dir):
        sio.savemat(str(d / "x.mat"),
                    {"inst_map": inst, "inst_centroid": cent,
                     "inst_type": types})

    main(["--mode", "instance", "--pred_dir", str(pred_dir),
          "--true_dir", str(true_dir)])
    out = capsys.readouterr().out
    # perfect prediction -> all six metrics 1.0
    assert out.count("1.00000") == 6

    main(["--mode", "type", "--pred_dir", str(pred_dir),
          "--true_dir", str(true_dir)])
    out = capsys.readouterr().out
    assert "1.00000" in out


def test_run_infer_tile_cli(tmp_path):
    import cv2
    import jax
    import jax.numpy as jnp

    from hover_net_tpu.cli.run_infer import main
    from hover_net_tpu.models import HoVerNet, HoVerNetConfig
    from hover_net_tpu.models.checkpoints import save_checkpoint

    cfg = HoVerNetConfig(mode="fast", nr_types=None, width=8)
    model = HoVerNet(cfg)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)), train=False
    ))()
    ckpt = str(tmp_path / "m.msgpack")
    save_checkpoint(ckpt, variables)

    in_dir = tmp_path / "in"
    os.makedirs(in_dir)
    rng = np.random.default_rng(0)
    cv2.imwrite(str(in_dir / "t.png"),
                rng.integers(0, 255, (180, 200, 3), dtype=np.uint8))

    out_dir = str(tmp_path / "out")
    main([
        "--model_path", ckpt, "--model_mode", "fast", "--width", "8",
        "--batch_size", "4",
        "tile", "--input_dir", str(in_dir), "--output_dir", out_dir,
    ])
    assert os.path.exists(f"{out_dir}/mat/t.mat")
    assert os.path.exists(f"{out_dir}/json/t.json")
    assert os.path.exists(f"{out_dir}/overlay/t.png")
