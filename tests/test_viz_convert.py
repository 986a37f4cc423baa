"""Contract tests for the visualization tails and the QuPath batch
re-export CLI (reference misc/viz_utils.py:42-90,129-173 and
convert_format.py:53-102 counterparts)."""

import json
import os

import numpy as np

from hover_net_tpu.utils.viz import gen_figure, overlay_instances_map


def _disk_map(shape=(60, 80)):
    inst = np.zeros(shape, np.int32)
    yy, xx = np.mgrid[: shape[0], : shape[1]]
    inst[(yy - 20) ** 2 + (xx - 20) ** 2 <= 64] = 1
    inst[(yy - 35) ** 2 + (xx - 55) ** 2 <= 100] = 2
    return inst


def test_overlay_instances_map_random_colours():
    inst = _disk_map()
    img = np.full(inst.shape + (3,), 230, np.uint8)
    out = overlay_instances_map(img, inst)
    assert out.shape == img.shape and out.dtype == np.uint8
    changed = (out != img).any(-1)
    assert changed.sum() > 40  # contours drawn
    # contour pixels hug the instances (within the 2px margin + stroke)
    from scipy.ndimage import binary_dilation

    near = binary_dilation(inst > 0, iterations=4)
    assert changed[~near].sum() == 0


def test_overlay_instances_map_typed_colours():
    inst = _disk_map()
    tmap = np.where(inst == 1, 2, 0) + np.where(inst == 2, 1, 0)
    img = np.zeros(inst.shape + (3,), np.uint8)
    out = overlay_instances_map(
        img, inst, type_map=tmap,
        type_colour={0: (0, 0, 0), 1: (0, 255, 0), 2: (255, 0, 0)},
    )
    # instance 1 has type 2 -> red stroke near it; instance 2 green
    assert (out[..., 0] == 255).any() and (out[..., 1] == 255).any()
    reds = np.argwhere(out[..., 0] == 255)
    assert reds[:, 1].max() < 40  # red only around the left instance


def test_gen_figure_grid():
    import matplotlib

    matplotlib.use("Agg")
    imgs = [np.random.rand(8, 8) for _ in range(5)]
    fig = gen_figure(imgs, [f"t{i}" for i in range(5)])
    assert len(fig.axes) >= 5
    assert fig.axes[0].get_title() == "t0"
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_convert_format_cli(tmp_path):
    from hover_net_tpu.cli.convert_format import main

    jdir = tmp_path / "json"
    os.makedirs(jdir)
    payload = {
        "mag": 40,
        "nuc": {
            "1": {"centroid": [10.6, 20.2], "type": 1,
                  "contour": [[1, 1], [2, 2]]},
            "2": {"centroid": [30.0, 40.0], "type": 2,
                  "contour": [[3, 3], [4, 4]]},
        },
    }
    with open(jdir / "a.json", "w") as f:
        json.dump(payload, f)

    out = tmp_path / "qupath"
    tinfo = tmp_path / "type_info.json"
    with open(tinfo, "w") as f:
        json.dump({
            "0": ["bg", [0, 0, 0]],
            "1": ["epi", [255, 0, 0]],
            "2": ["inf", [0, 255, 0]],
        }, f)

    main([
        "--json_dir", str(jdir), "--output_dir", str(out),
        "--type_info_path", str(tinfo), "--nr_types", "3",
        "--scale_factor", "2.0",
    ])

    rows = open(out / "a.tsv").read().strip().split("\n")
    assert rows[0] == "x\ty\tclass\tname\tcolor"
    # scale_factor applied then int32-cast (convert_format.py:90-92)
    assert rows[1].split("\t") == [
        "21", "40", "", "epi", str((255 << 16))
    ]
    assert rows[2].split("\t")[3] == "inf"


def test_convert_format_untyped(tmp_path):
    from hover_net_tpu.cli.convert_format import main

    jdir = tmp_path / "json"
    os.makedirs(jdir)
    with open(jdir / "b.json", "w") as f:
        json.dump({"nuc": {"1": {"centroid": [5, 6], "type": None}}}, f)
    main(["--json_dir", str(jdir)])
    rows = open(jdir / "b.tsv").read().strip().split("\n")
    assert len(rows) == 2 and rows[1].split("\t")[3] == "no label"
