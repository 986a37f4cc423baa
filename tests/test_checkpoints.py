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
