"""Host post-processing oracle on synthetic nuclei.

Builds a synthetic pred_map (NP prob + HV offsets) from painted blobs and
checks the watershed recovers them — including separating two touching
nuclei, which is the entire point of the HV maps.
"""

import numpy as np
import pytest

from hover_net_tpu.ops.post_proc_host import proc_np_hv, process, extract_instance_info
from hover_net_tpu.ops.cc_np import (
    ellipse_structuring_element,
    watershed,
    remove_small_objects,
    label,
)
from hover_net_tpu.ops.targets import gen_instance_hv_map


def make_pred_map(inst_map):
    """Synthesize an ideal network output from a GT instance map."""
    hv = gen_instance_hv_map(inst_map.astype(np.int32), inst_map.shape)
    np_prob = (inst_map > 0).astype(np.float32)
    return np.dstack([np_prob, hv[..., 0], hv[..., 1]])


def _disk(center, radius, shape):
    yy, xx = np.mgrid[: shape[0], : shape[1]]
    return ((yy - center[0]) ** 2 + (xx - center[1]) ** 2) <= radius**2


def test_ellipse_selem_matches_cv2():
    import cv2

    got = ellipse_structuring_element(5, 5)
    expect = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (5, 5))
    np.testing.assert_array_equal(got, expect)


def test_watershed_splits_two_basins():
    img = np.zeros((16, 16))
    img[:, 8:] += 0.1  # slight ridge; two markers flood their halves
    markers = np.zeros((16, 16), np.int32)
    markers[8, 2] = 1
    markers[8, 13] = 2
    mask = np.ones((16, 16), bool)
    out = watershed(img, markers, mask=mask)
    assert set(np.unique(out)) == {1, 2}
    assert out[8, 0] == 1 and out[8, 15] == 2


def test_separates_touching_nuclei():
    inst = np.zeros((80, 80), np.int32)
    inst[_disk((40, 28), 12, inst.shape)] = 1
    m2 = _disk((40, 52), 12, inst.shape)
    inst[m2 & (inst == 0)] = 2  # touching pair
    pred_map = make_pred_map(inst)
    out = proc_np_hv(pred_map)
    ids = set(np.unique(out)) - {0}
    assert len(ids) == 2, f"expected 2 instances, got {ids}"
    # the two recovered instances roughly occupy the true disks
    left = out[40, 24]
    right = out[40, 56]
    assert left != 0 and right != 0 and left != right


def test_process_with_types_contract():
    inst = np.zeros((80, 80), np.int32)
    inst[_disk((30, 30), 10, inst.shape)] = 1
    inst[_disk((60, 60), 8, inst.shape)] = 2
    tp = np.zeros((80, 80), np.float32)
    tp[inst == 1] = 2
    tp[inst == 2] = 3
    pred_map = np.dstack([tp, make_pred_map(inst)])
    pred_inst, info = process(pred_map, nr_types=5)
    assert pred_inst.dtype == np.int32
    assert len(info) == 2
    for inst_id, inst_info in info.items():
        assert set(inst_info) == {"bbox", "centroid", "contour", "type", "type_prob"}
        assert inst_info["type"] in (2, 3)
        assert inst_info["type_prob"] > 0.9
    # centroids near the painted centers (x, y) order
    cents = sorted([tuple(np.round(v["centroid"]).astype(int)) for v in info.values()])
    assert abs(cents[0][0] - 30) <= 2 and abs(cents[0][1] - 30) <= 2
    assert abs(cents[1][0] - 60) <= 2 and abs(cents[1][1] - 60) <= 2


def test_remove_small_objects_labelled():
    lab = np.zeros((20, 20), np.int32)
    lab[1:3, 1:3] = 1  # 4 px
    lab[10:16, 10:16] = 2  # 36 px
    out = remove_small_objects(lab.copy(), min_size=10)
    assert set(np.unique(out)) == {0, 2}
