"""HV target generation on synthetic instances (targets.py:17-114 parity)."""

import numpy as np

from hover_net_tpu.ops.targets import gen_instance_hv_map, gen_targets, fix_mirror_padding


def _disk(center, radius, shape):
    yy, xx = np.mgrid[: shape[0], : shape[1]]
    return ((yy - center[0]) ** 2 + (xx - center[1]) ** 2) <= radius**2


def test_single_square_instance():
    ann = np.zeros((64, 64), np.int32)
    ann[20:31, 24:35] = 1  # 11x11 square, com at (25, 29)
    hv = gen_instance_hv_map(ann, (64, 64))
    assert hv.shape == (64, 64, 2)
    # x map: -1 at left edge of instance, +1 at right; zero column sits at
    # com-1 (the reference's 1-based meshgrid quirk, targets.py:63-67)
    assert hv[25, 24, 0] == -1.0
    assert hv[25, 34, 0] == 1.0
    assert hv[25, 28, 0] == 0.0
    # y map: -1 top, +1 bottom, zero row at com-1
    assert hv[20, 29, 1] == -1.0
    assert hv[30, 29, 1] == 1.0
    assert hv[24, 29, 1] == 0.0
    # background zero
    assert hv[0, 0, 0] == 0.0 and hv[0, 0, 1] == 0.0
    # values strictly within [-1, 1]
    assert hv.min() >= -1.0 and hv.max() <= 1.0


def test_gen_targets_contract():
    ann = np.zeros((64, 64), np.int32)
    ann[_disk((32, 32), 10, ann.shape)] = 1
    ann[_disk((10, 50), 6, ann.shape)] = 2
    out = gen_targets(ann, (40, 40))
    assert out["np_map"].shape == (40, 40)
    assert out["hv_map"].shape == (40, 40, 2)
    assert set(np.unique(out["np_map"])) <= {0, 1}
    # the centered disk survives the crop
    assert out["np_map"][20, 20] == 1


def test_small_instances_removed():
    ann = np.zeros((64, 64), np.int32)
    ann[30:32, 30:32] = 1  # 4 px < min_size 30
    hv = gen_instance_hv_map(ann, (64, 64))
    assert np.all(hv == 0)


def test_fix_mirror_padding_splits_duplicates():
    ann = np.zeros((32, 32), np.int32)
    ann[2:8, 2:8] = 1
    ann[20:26, 20:26] = 1  # same ID, disconnected (mirror artefact)
    fixed = fix_mirror_padding(ann.copy())
    ids = set(np.unique(fixed)) - {0}
    assert len(ids) == 2
