"""Training-target generation (NP map + horizontal/vertical distance maps).

Host-side NumPy: this runs in dataloader workers per sample, exactly like
the reference (models/hovernet/targets.py:17-114). Per-instance math is
identical; verified on synthetic instances in tests/test_targets.py.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage

from ..utils.crops import cropping_center, get_bounding_box
from .cc_np import remove_small_objects


def fix_mirror_padding(ann):
    """Re-label instance fragments duplicated by mirrored shape
    augmentation (dataloader/augs.py:18-32)."""
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


def gen_instance_hv_map(ann, crop_shape):
    """Per-pixel horizontal/vertical offsets from each instance's center
    of mass, normalised to [-1, 1] within the instance
    (targets.py:17-96)."""
    orig_ann = ann.copy()
    fixed_ann = fix_mirror_padding(orig_ann)
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
        # expand bbox by 2px (valid: patches are mirror-padded upstream)
        inst_box[0] -= 2
        inst_box[2] -= 2
        inst_box[1] += 2
        inst_box[3] += 2
        inst_box[0] = max(inst_box[0], 0)
        inst_box[2] = max(inst_box[2], 0)

        inst_map = inst_map[inst_box[0] : inst_box[1], inst_box[2] : inst_box[3]]
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

        x_box = x_map[inst_box[0] : inst_box[1], inst_box[2] : inst_box[3]]
        x_box[inst_map > 0] = inst_x[inst_map > 0]
        y_box = y_map[inst_box[0] : inst_box[1], inst_box[2] : inst_box[3]]
        y_box[inst_map > 0] = inst_y[inst_map > 0]

    return np.dstack([x_map, y_map])


def gen_targets(ann, crop_shape, **kwargs):
    """{np_map, hv_map} center-cropped to crop_shape (targets.py:100-114)."""
    hv_map = gen_instance_hv_map(ann, crop_shape)
    np_map = ann.copy()
    np_map[np_map > 0] = 1
    return {
        "hv_map": cropping_center(hv_map, crop_shape),
        "np_map": cropping_center(np_map, crop_shape),
    }
