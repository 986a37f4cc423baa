"""Checkpoint round-trip + torch importer structure tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import traverse_util

from hover_net_tpu.models import HoVerNet, HoVerNetConfig
from hover_net_tpu.models.checkpoints import (
    import_torch_state_dict,
    load_checkpoint,
    save_checkpoint,
    torch_name_map,
)


def tiny_variables(cfg):
    model = HoVerNet(cfg)
    size = 96 if cfg.mode == "fast" else 198
    dummy = jnp.zeros((1, size, size, 3), jnp.float32)
    return model, model.init(jax.random.PRNGKey(0), dummy, train=False)


def test_native_roundtrip(tmp_path):
    cfg = HoVerNetConfig(mode="fast", width=8)
    _, variables = tiny_variables(cfg)
    p = str(tmp_path / "ck.msgpack")
    save_checkpoint(p, variables, extra={"epoch": 3})
    loaded, extra = load_checkpoint(p)
    assert extra["epoch"] == 3
    a = jax.tree_util.tree_leaves(variables)
    b = jax.tree_util.tree_leaves(loaded)
    assert all(np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(a, b))


@pytest.mark.parametrize("mode,nr_types", [("fast", 5), ("original", None)])
def test_torch_name_map_covers_model_exactly(mode, nr_types):
    """The importer's flax paths must cover every variable of the real
    model, one-to-one."""
    cfg = HoVerNetConfig(mode=mode, nr_types=nr_types, width=8)
    _, variables = tiny_variables(cfg)
    model_paths = set(traverse_util.flatten_dict(variables).keys())
    map_paths = [tuple(p) for _, p, _ in torch_name_map(cfg)]
    assert len(map_paths) == len(set(map_paths))
    assert set(map_paths) == model_paths


def test_torch_import_roundtrip_values():
    """Synthesize a torch-style state dict with the correct shapes, import
    it, and check values land at the right leaves (incl. OIHW->HWIO)."""
    cfg = HoVerNetConfig(mode="fast", nr_types=None, width=8)
    model, variables = tiny_variables(cfg)
    flat = traverse_util.flatten_dict(variables)

    rng = np.random.default_rng(0)
    torch_state = {}
    for torch_key, flax_path, transform in torch_name_map(cfg):
        shape = np.asarray(flat[tuple(flax_path)]).shape
        if transform == "OIHW":
            h, w, i, o = shape
            # small scale: unit-variance kernels overflow f32 through a
            # 50-conv tower; this test only checks wiring
            torch_state[torch_key] = (
                0.01 * rng.normal(size=(o, i, h, w))
            ).astype(np.float32)
        elif torch_key.endswith("running_var"):
            torch_state[torch_key] = rng.uniform(0.5, 1.5, size=shape).astype(np.float32)
        else:
            torch_state[torch_key] = rng.normal(size=shape).astype(np.float32)

    imported = import_torch_state_dict(torch_state, cfg)
    iflat = traverse_util.flatten_dict(imported)
    assert set(iflat.keys()) == set(flat.keys())
    # check one conv transpose explicitly
    k = ("params", "conv0", "conv", "kernel")
    np.testing.assert_array_equal(
        iflat[k], torch_state["conv0./.weight"].transpose(2, 3, 1, 0)
    )
    # model must run with imported weights
    x = jnp.zeros((1, 96, 96, 3))
    out = model.apply(imported, x, train=False)
    assert all(np.isfinite(np.asarray(v)).all() for v in out.values())


# ---------------------------------------------------------------- npz import

import os

from hover_net_tpu.models.checkpoints import load_pretrained_npz, tf_name_map

_CSV = "/root/reference/variables_tf2pytorch.csv"


@pytest.mark.skipif(not os.path.exists(_CSV), reason="reference CSV absent")
def test_tf_name_map_matches_reference_csv():
    """Non-circular naming oracle: the reference ships a 668-row
    TF<->torch name table (variables_tf2pytorch.csv). Our generated
    tf_name_map and torch_name_map must send each CSV pair to the SAME
    flax path, and cover every row (minus the ImageNet linear head and
    the parameterless upsample buffer)."""
    cfg = HoVerNetConfig(mode="original", nr_types=5)
    tf_to_flax = {k: tuple(p) for k, p in tf_name_map(cfg)}
    torch_to_flax = {k: tuple(p) for k, p, _ in torch_name_map(cfg)}

    n_checked = 0
    with open(_CSV) as f:
        next(f)  # header
        for line in f:
            torch_key, tf_key = line.strip().split(",")
            if torch_key.startswith(("linear", "upsample2x")):
                continue
            assert tf_key in tf_to_flax, tf_key
            assert torch_key in torch_to_flax, torch_key
            assert tf_to_flax[tf_key] == torch_to_flax[torch_key], (
                tf_key, torch_key)
            n_checked += 1
    assert n_checked > 600
    # and the CSV covers our whole map (nothing invented on our side)
    assert n_checked == len(tf_to_flax) == len(torch_to_flax)


def test_npz_import_tf_and_torch_styles_agree(tmp_path):
    """Exporting the same weights under both naming styles must import
    to identical pytrees, and either fully covers the model."""
    cfg = HoVerNetConfig(mode="fast", nr_types=5, width=8)
    _, variables = tiny_variables(cfg)
    flat = {k: np.asarray(v)
            for k, v in traverse_util.flatten_dict(variables).items()}

    tf_npz = {k: flat[tuple(p)] for k, p in tf_name_map(cfg)}
    torch_npz = {}
    for k, p, transform in torch_name_map(cfg):
        v = flat[tuple(p)]
        if transform == "OIHW":
            v = v.transpose(3, 2, 0, 1)  # HWIO -> OIHW
        torch_npz["module." + k] = v

    p_tf = str(tmp_path / "tf.npz")
    p_torch = str(tmp_path / "torch.npz")
    np.savez(p_tf, **tf_npz)
    np.savez(p_torch, **torch_npz)

    a = load_pretrained_npz(p_tf, cfg)
    b = load_pretrained_npz(p_torch, cfg)
    fa = traverse_util.flatten_dict(a)
    fb = traverse_util.flatten_dict(b)
    assert set(fa) == set(fb) == set(flat)
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k])
        np.testing.assert_array_equal(fa[k], flat[k])


def test_npz_import_encoder_only_ok_but_partial_encoder_fails(tmp_path):
    cfg = HoVerNetConfig(mode="fast", nr_types=5, width=8)
    _, variables = tiny_variables(cfg)
    flat = {k: np.asarray(v)
            for k, v in traverse_util.flatten_dict(variables).items()}
    enc = {k: flat[tuple(p)] for k, p in tf_name_map(cfg)
           if p[1] in ("conv0", "d0", "d1", "d2", "d3")}
    enc["linear/W:0"] = np.zeros((8, 1000), np.float32)  # ImageNet head

    p_ok = str(tmp_path / "imagenet.npz")
    np.savez(p_ok, **enc)
    out = load_pretrained_npz(p_ok, cfg)  # encoder-only: fine
    assert "d3" in out["params"] and "decoder_np" not in out["params"]

    enc.pop("group2/block3/conv2/W:0")
    p_bad = str(tmp_path / "broken.npz")
    np.savez(p_bad, **enc)
    with pytest.raises(KeyError, match="encoder"):
        load_pretrained_npz(p_bad, cfg)
