"""Metrics: vectorised implementations vs brute-force definitions.

The brute-force versions below are written straight from the metric
definitions (AJI greedy best-IoU with reuse; AJI+ Munkres; PQ IoU>0.5) so
they independently pin the semantics of metrics/stats_utils.py.
"""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from hover_net_tpu.metrics import (
    get_dice_1,
    get_fast_aji,
    get_fast_aji_plus,
    get_fast_dice_2,
    get_fast_pq,
    pair_coordinates,
    remap_label,
)


def random_instances(rng, shape=(64, 64), n=6, r=(4, 9)):
    lab = np.zeros(shape, np.int32)
    k = 1
    for _ in range(n):
        cy, cx = rng.integers(8, shape[0] - 8, 2)
        rad = rng.integers(*r)
        yy, xx = np.mgrid[: shape[0], : shape[1]]
        mask = ((yy - cy) ** 2 + (xx - cx) ** 2) <= rad**2
        mask &= lab == 0
        if mask.sum() > 4:
            lab[mask] = k
            k += 1
    return lab


def perturb(rng, lab):
    """Shift + drop + merge to create an imperfect prediction."""
    pred = np.roll(lab, shift=(1, -2), axis=(0, 1))
    ids = np.unique(pred)[1:]
    if len(ids) > 2:
        pred[pred == ids[0]] = 0  # drop one
        pred[pred == ids[-1]] = ids[-2]  # merge two
    return remap_label(pred)


# ---------- brute-force oracles ----------

def iou_matrix(true, pred):
    tids = np.unique(true)[1:]
    pids = np.unique(pred)[1:]
    inter = np.zeros((len(tids), len(pids)))
    union = np.zeros_like(inter)
    for i, t in enumerate(tids):
        tm = true == t
        for j, p in enumerate(pids):
            pm = pred == p
            inter[i, j] = (tm & pm).sum()
            union[i, j] = (tm | pm).sum()
    return inter, union, tids, pids


def slow_aji(true, pred):
    inter, union, tids, pids = iou_matrix(true, pred)
    if len(tids) == 0 or len(pids) == 0:
        return 0.0
    iou = inter / (union + 1e-6)
    used_pred = set()
    num = den = 0.0
    for i in range(len(tids)):
        j = int(np.argmax(iou[i]))
        if iou[i, j] > 0:
            num += inter[i, j]
            den += union[i, j]
            used_pred.add(j)
        else:
            den += (true == tids[i]).sum()
    for j in range(len(pids)):
        if j not in used_pred:
            den += (pred == pids[j]).sum()
    return num / den


def slow_pq(true, pred):
    inter, union, tids, pids = iou_matrix(true, pred)
    iou = np.where(inter > 0, inter / np.maximum(union, 1), 0.0)
    pairs = np.nonzero(iou > 0.5)
    tp = len(pairs[0])
    fp = len(pids) - tp
    fn = len(tids) - tp
    dq = tp / (tp + 0.5 * fp + 0.5 * fn)
    sq = iou[pairs].sum() / (tp + 1e-6)
    return dq, sq, dq * sq


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_aji_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    true = random_instances(rng)
    pred = perturb(rng, true)
    np.testing.assert_allclose(get_fast_aji(true, pred), slow_aji(true, pred), rtol=1e-9)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pq_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    true = random_instances(rng)
    pred = perturb(rng, true)
    got, _ = get_fast_pq(true, pred)
    np.testing.assert_allclose(got, slow_pq(true, pred), rtol=1e-9)


def test_perfect_prediction_scores_one():
    rng = np.random.default_rng(3)
    true = random_instances(rng)
    assert get_dice_1(true, true) == 1.0
    np.testing.assert_allclose(get_fast_aji(true, true), 1.0)
    np.testing.assert_allclose(get_fast_aji_plus(true, true), 1.0)
    np.testing.assert_allclose(get_fast_dice_2(true, true), 1.0)
    pq, _ = get_fast_pq(true, true)
    np.testing.assert_allclose(pq, [1.0, 1.0, 1.0], atol=1e-6)


def test_aji_plus_no_over_penalisation():
    """Split prediction: AJI+ >= AJI (the whole point of AJI+)."""
    true = np.zeros((32, 32), np.int32)
    true[4:28, 4:28] = 1
    pred = np.zeros_like(true)
    pred[4:28, 4:15] = 1
    pred[4:28, 15:28] = 2
    assert get_fast_aji_plus(true, pred) >= get_fast_aji(true, pred)


def test_remap_label():
    lab = np.zeros((8, 8), np.int32)
    lab[0, 0] = 5
    lab[4:6, 4:6] = 9
    out = remap_label(lab)
    assert set(np.unique(out)) == {0, 1, 2}
    out_sz = remap_label(lab, by_size=True)
    assert out_sz[4, 4] == 1  # bigger instance gets id 1


def test_pair_coordinates():
    a = np.array([[0.0, 0.0], [10.0, 10.0], [50.0, 50.0]], np.float32)
    b = np.array([[1.0, 1.0], [30.0, 30.0]], np.float32)
    pairs, ua, ub = pair_coordinates(a, b, radius=5)
    assert pairs.tolist() == [[0, 0]]
    assert ua.tolist() == [1, 2]
    assert ub.tolist() == [1]


def test_dice1_hand_value():
    true = np.zeros((4, 4), np.int32)
    pred = np.zeros((4, 4), np.int32)
    true[:2] = 1  # 8 px
    pred[1:3] = 1  # 8 px, overlap 4
    assert get_dice_1(true, pred) == 2 * 4 / 16
