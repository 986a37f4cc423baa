"""Augmentation + train loader tests."""

import numpy as np
import pytest

from hover_net_tpu.data.augs import (
    TrainAugmentor,
    add_to_brightness,
    add_to_contrast,
    add_to_hue,
    add_to_saturation,
    additive_gaussian_noise,
    gaussian_blur,
    median_blur,
)
from hover_net_tpu.data.train_pipeline import PatchDataset, TrainLoader
from hover_net_tpu.data.patch_extract import extract_mirror, extract_valid
from hover_net_tpu.utils.summary import model_summary


def test_augmentor_shapes_and_alignment(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (140, 140, 3), dtype=np.uint8)
    ann = np.zeros((140, 140, 2), np.int32)
    ann[40:70, 40:70, 0] = 1
    ann[40:70, 40:70, 1] = 3
    aug = TrainAugmentor((96, 96), mode="train", seed=0)
    out_img, out_ann = aug(img, ann)
    assert out_img.shape == (96, 96, 3)
    # ann follows the img through affine+crop+flips, like the
    # reference's shape_augs chain (train_loader.py:113-138)
    assert out_ann.shape == (96, 96, 2)
    # annotation stays integer-valued (nearest-neighbour interp)
    assert set(np.unique(out_ann[..., 1])) <= {0, 3}


def test_augmentor_valid_mode_is_center_crop():
    img = np.arange(140 * 140 * 3, dtype=np.uint8).reshape(140, 140, 3)
    ann = np.arange(140 * 140, dtype=np.int32).reshape(140, 140, 1)
    aug = TrainAugmentor((96, 96), mode="valid", seed=0)
    out_img, out_ann = aug(img.copy(), ann)
    np.testing.assert_array_equal(out_img, img[22:118, 22:118])
    np.testing.assert_array_equal(out_ann, ann[22:118, 22:118])


def test_photometric_ops_preserve_shape_dtype():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    for fn in (gaussian_blur, median_blur, additive_gaussian_noise,
               add_to_hue, add_to_saturation, add_to_brightness,
               add_to_contrast):
        out = fn(rng, img)
        assert out.shape == img.shape and out.dtype == np.uint8, fn.__name__


def test_contrast_aug_is_not_a_noop():
    """The reference's contrast aug clips the wrong variable and returns
    the input unchanged (dataloader/augs.py:97); ours must actually
    change contrast."""
    rng = np.random.default_rng(2)
    img = rng.integers(60, 190, (32, 32, 3), dtype=np.uint8)
    changed = any(
        not np.array_equal(add_to_contrast(np.random.default_rng(s), img), img)
        for s in range(5)
    )
    assert changed


def test_train_loader_epoch(tmp_path):
    rng = np.random.default_rng(0)
    for i in range(5):
        img = rng.integers(0, 255, (140, 140, 3), dtype=np.uint8)
        inst = np.zeros((140, 140, 1), np.int32)
        inst[30:60, 30:60] = i % 2 + 1
        np.save(tmp_path / f"p{i}.npy",
                np.concatenate([img, inst], -1).astype(np.int32))
    loader = TrainLoader(
        PatchDataset([str(tmp_path)]), batch_size=2, input_shape=(96, 96),
        mask_shape=(40, 40), mode="train", with_type=False, num_workers=0,
    )
    assert loader.steps_per_epoch() == 2
    batches = list(loader)
    assert len(batches) == 2  # drop_last in train mode
    b = batches[0]
    assert b["img"].shape == (2, 96, 96, 3)
    assert b["np_map"].shape == (2, 40, 40)
    assert b["hv_map"].shape == (2, 40, 40, 2)
    # different epochs shuffle differently but produce the same set
    loader.close()


def test_extract_windows():
    x = np.arange(20 * 20, dtype=np.int32).reshape(20, 20)
    valid = extract_valid(x, (8, 8), (6, 6))
    assert all(p.shape == (8, 8) for p in valid)
    mirror = extract_mirror(x, (8, 8), (6, 6))
    assert all(p.shape == (8, 8) for p in mirror)
    assert len(mirror) >= len(valid)


def test_model_summary():
    import jax
    import jax.numpy as jnp

    from hover_net_tpu.models import HoVerNet, HoVerNetConfig

    cfg = HoVerNetConfig(mode="fast", width=8)
    model = HoVerNet(cfg)
    v = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3)), train=False
    ))()
    text = model_summary(v)
    assert "total parameters:" in text
    assert "conv0/conv/kernel" in text
