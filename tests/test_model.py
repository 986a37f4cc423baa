"""Model geometry + freeze semantics tests.

Uses a width-8 model: identical layer graph / crop geometry to the
reference-width network, 64x fewer FLOPs. Small (non-canonical) input
sizes keep CPU runtime low; canonical 270->80 / 256->164 geometry is
checked arithmetically plus once end-to-end.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hover_net_tpu.models import HoVerNetConfig, HoVerNet
from hover_net_tpu.models.blocks import upsample2x

# minimal valid test sizes (divisibility + positive dense-block output)
TEST_SIZES = {"original": 198, "fast": 96}


@functools.lru_cache(maxsize=None)
def small_model(mode, nr_types):
    cfg = HoVerNetConfig(mode=mode, nr_types=nr_types, width=8)
    model = HoVerNet(cfg)
    size = TEST_SIZES[mode]
    dummy = jnp.zeros((1, size, size, 3), jnp.float32)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), dummy, train=False))()
    return model, variables, size


def expected_out(mode, in_sz):
    k = 5 if mode == "original" else 3
    s0 = in_sz - 6 if mode == "original" else in_sz
    s2 = s0 // 4
    u3 = s2 - 9 * (k - 1)
    u2 = 2 * u3 - 5 * (k - 1)
    return 2 * u2


def test_canonical_geometry_matches_reference_constants():
    # net_desc.py:124-129 crops and config.py:40-45 shape contracts
    assert expected_out("original", 270) == 80
    assert expected_out("fast", 256) == 164
    for mode, (d0_crop, d1_crop) in {"original": (184, 72), "fast": (92, 36)}.items():
        in_sz = 270 if mode == "original" else 256
        k = 5 if mode == "original" else 3
        s0 = in_sz - 6 if mode == "original" else in_sz
        s1, s2 = s0 // 2, s0 // 4
        td1 = 2 * (s2 - 9 * (k - 1))
        td0 = 2 * (td1 - 5 * (k - 1))
        assert s1 - td1 == d1_crop
        assert s0 - td0 == d0_crop


@pytest.mark.parametrize("mode", ["original", "fast"])
@pytest.mark.parametrize("nr_types", [None, 5])
def test_forward_shapes(mode, nr_types):
    model, variables, size = small_model(mode, nr_types)
    x = jnp.zeros((1, size, size, 3), jnp.float32)
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    branches = {"np", "hv"} if nr_types is None else {"tp", "np", "hv"}
    assert set(out) == branches
    out_sz = expected_out(mode, size)
    for name, arr in out.items():
        ch = 2 if name in ("np", "hv") else nr_types
        assert arr.shape == (1, out_sz, out_sz, ch), (name, arr.shape)


def test_upsample2x_nearest():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    y = upsample2x(x)
    expect = np.array([[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]], np.float32)
    np.testing.assert_array_equal(np.asarray(y[0, :, :, 0]), expect)


def test_train_mode_updates_batch_stats():
    model, variables, size = small_model("fast", None)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, size, size, 3)) * 255
    _, mutated = jax.jit(
        lambda v, x: model.apply(v, x, train=True, mutable=["batch_stats"])
    )(variables, x)
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_freeze_encoder_gradient_cut():
    """Phase-0 freeze: d1..d3 + d0 unit towers get zero grads; conv0,
    d0 shortcut, conv_bot and decoders get nonzero grads
    (net_desc.py:106-112 semantics)."""
    model, variables, size = small_model("fast", None)
    params, batch_stats = variables["params"], variables["batch_stats"]
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, size, size, 3)) * 255

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": batch_stats}, x, train=True,
            freeze_encoder=True, mutable=["batch_stats"],
        )
        return sum(jnp.sum(v**2) for v in out.values())

    grads = jax.jit(jax.grad(loss_fn))(params)

    def total(tree):
        return sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(tree))

    assert total(grads["d1"]) == 0.0
    assert total(grads["d2"]) == 0.0
    assert total(grads["d3"]) == 0.0
    assert total(grads["d0"]["unit0"]) == 0.0
    assert total(grads["d0"]["shortcut"]) > 0.0
    assert total(grads["conv0"]) > 0.0
    assert total(grads["conv_bot"]) > 0.0
    assert total(grads["decoder_np"]) > 0.0
