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


# --------------------------------------------------------------------------
# Oracle-equality sweep: the production implementation is fully vectorized
# (segment reductions); the functions below are a LITERAL TRANSCRIPTION of
# the reference algorithm (models/hovernet/targets.py:17-96,
# dataloader/augs.py:18-32), kept ONLY here as the parity oracle.
# --------------------------------------------------------------------------

from scipy import ndimage

from hover_net_tpu.utils.crops import cropping_center, get_bounding_box
from hover_net_tpu.ops.cc_np import remove_small_objects


def _oracle_fix_mirror_padding(ann):
    ann = ann.copy()
    current_max_id = np.amax(ann)
    inst_list = list(np.unique(ann))
    if 0 in inst_list:
        inst_list.remove(0)
    for inst_id in inst_list:
        inst_map = np.array(ann == inst_id, np.uint8)
        remapped_ids = ndimage.label(inst_map)[0]
        remapped_ids[remapped_ids > 1] += current_max_id
        ann[remapped_ids > 1] = remapped_ids[remapped_ids > 1]
        current_max_id = np.amax(ann)
    return ann


def _oracle_hv_map(ann, crop_shape):
    orig_ann = ann.copy()
    fixed_ann = _oracle_fix_mirror_padding(orig_ann)
    crop_ann = cropping_center(fixed_ann, crop_shape)
    crop_ann = remove_small_objects(crop_ann, min_size=30)

    x_map = np.zeros(orig_ann.shape[:2], dtype=np.float32)
    y_map = np.zeros(orig_ann.shape[:2], dtype=np.float32)

    inst_list = list(np.unique(crop_ann))
    if 0 in inst_list:
        inst_list.remove(0)
    for inst_id in inst_list:
        inst_map = np.array(fixed_ann == inst_id, np.uint8)
        inst_box = get_bounding_box(inst_map)
        inst_box[0] -= 2
        inst_box[2] -= 2
        inst_box[1] += 2
        inst_box[3] += 2
        inst_box[0] = max(inst_box[0], 0)
        inst_box[2] = max(inst_box[2], 0)

        inst_map = inst_map[inst_box[0]: inst_box[1], inst_box[2]: inst_box[3]]
        if inst_map.shape[0] < 2 or inst_map.shape[1] < 2:
            continue

        inst_com = list(ndimage.center_of_mass(inst_map))
        inst_com[0] = int(inst_com[0] + 0.5)
        inst_com[1] = int(inst_com[1] + 0.5)

        inst_x_range = np.arange(1, inst_map.shape[1] + 1) - inst_com[1]
        inst_y_range = np.arange(1, inst_map.shape[0] + 1) - inst_com[0]
        inst_x, inst_y = np.meshgrid(inst_x_range, inst_y_range)

        inst_x[inst_map == 0] = 0
        inst_y[inst_map == 0] = 0
        inst_x = inst_x.astype("float32")
        inst_y = inst_y.astype("float32")

        if np.min(inst_x) < 0:
            inst_x[inst_x < 0] /= -np.amin(inst_x[inst_x < 0])
        if np.min(inst_y) < 0:
            inst_y[inst_y < 0] /= -np.amin(inst_y[inst_y < 0])
        if np.max(inst_x) > 0:
            inst_x[inst_x > 0] /= np.amax(inst_x[inst_x > 0])
        if np.max(inst_y) > 0:
            inst_y[inst_y > 0] /= np.amax(inst_y[inst_y > 0])

        x_box = x_map[inst_box[0]: inst_box[1], inst_box[2]: inst_box[3]]
        x_box[inst_map > 0] = inst_x[inst_map > 0]
        y_box = y_map[inst_box[0]: inst_box[1], inst_box[2]: inst_box[3]]
        y_box[inst_map > 0] = inst_y[inst_map > 0]

    return np.dstack([x_map, y_map])


def _random_blob_ann(rng, shape=(96, 96), n_inst=12, mirror=False):
    ann = np.zeros(shape, np.int32)
    for i in range(1, n_inst + 1):
        cy = rng.integers(0, shape[0])
        cx = rng.integers(0, shape[1])
        r = rng.integers(1, 9)
        ann[_disk((cy, cx), r, shape)] = i
    if mirror:
        # mirror-pad duplication artefact: reflect a band like imgaug does
        ann[:8, :] = ann[15:7:-1, :]
        ann[:, :8] = ann[:, 15:7:-1]
    return ann


def test_vectorized_matches_oracle_exactly():
    rng = np.random.default_rng(42)
    for trial in range(30):
        mirror = trial % 2 == 1
        ann = _random_blob_ann(rng, n_inst=int(rng.integers(1, 20)),
                               mirror=mirror)
        fixed = fix_mirror_padding(ann)
        oracle_fixed = _oracle_fix_mirror_padding(ann)
        np.testing.assert_array_equal(fixed, oracle_fixed)

        got = gen_instance_hv_map(ann, (64, 64))
        want = _oracle_hv_map(ann, (64, 64))
        np.testing.assert_array_equal(got, want)


def test_vectorized_matches_oracle_edge_cases():
    # empty, single pixel, instance touching borders, full-frame instance
    cases = [np.zeros((40, 40), np.int32)]
    a = np.zeros((40, 40), np.int32); a[5, 5] = 1; cases.append(a)
    b = np.zeros((40, 40), np.int32); b[0:33, 0:33] = 3; cases.append(b)
    c = np.ones((40, 40), np.int32); cases.append(c)
    d = np.zeros((40, 40), np.int32)
    d[0:20, 0:20] = 1; d[20:40, 20:40] = 1  # diagonal same-id (not 4-conn)
    d[0:18, 22:40] = 2
    cases.append(d)
    for ann in cases:
        np.testing.assert_array_equal(
            fix_mirror_padding(ann), _oracle_fix_mirror_padding(ann))
        np.testing.assert_array_equal(
            gen_instance_hv_map(ann, (32, 32)), _oracle_hv_map(ann, (32, 32)))


def test_native_hv_targets_matches_numpy_path():
    """The fused C++ pass (instance_table.cpp hv_targets) must be
    bit-identical to the NumPy formulation it replaces on the loader
    hot path (same float64 CoM rounding, float32 divisions)."""
    import hover_net_tpu.ops.instance_table as IT
    from hover_net_tpu.ops.instance_table import hv_targets_native

    if IT._build_lib() is None:
        import pytest
        pytest.skip("no native toolchain")

    rng = np.random.default_rng(7)
    for trial in range(12):
        mirror = trial % 2 == 1
        ann = _random_blob_ann(rng, n_inst=int(rng.integers(1, 25)),
                               mirror=mirror)
        if trial % 4 == 0:
            ann[1:3, 1:2] = ann.max() + 1  # 2 px instance
        got = hv_targets_native(ann, (64, 64))
        orig = IT.hv_targets_native
        IT.hv_targets_native = lambda *a, **k: None
        try:
            want = gen_instance_hv_map(ann, (64, 64))
        finally:
            IT.hv_targets_native = orig
        np.testing.assert_array_equal(got, want)
