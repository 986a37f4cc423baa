"""Loss functions vs hand-computed NumPy values (utils.py:54-172 parity)."""

import jax.numpy as jnp
import numpy as np

from hover_net_tpu.ops import losses


def test_xentropy_loss_matches_manual():
    rng = np.random.default_rng(0)
    pred = rng.uniform(0.01, 1.0, (2, 4, 4, 3)).astype(np.float32)
    pred = pred / pred.sum(-1, keepdims=True)
    true = np.eye(3, dtype=np.float32)[rng.integers(0, 3, (2, 4, 4))]
    eps = 1.0e-7
    p = np.clip(pred, eps, 1 - eps)
    expect = np.mean(-np.sum(true * np.log(p), -1, keepdims=True))
    got = float(losses.xentropy_loss(jnp.asarray(true), jnp.asarray(pred)))
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_dice_loss_perfect_and_disjoint():
    true = np.zeros((1, 4, 4, 2), np.float32)
    true[..., 1] = 1.0
    # perfect prediction -> ~0 per channel against its own mask
    got = float(losses.dice_loss(jnp.asarray(true), jnp.asarray(true)))
    np.testing.assert_allclose(got, 0.0, atol=1e-4)
    # fully disjoint -> each channel's dice term is 1 - smooth/(sum+smooth)
    pred = 1.0 - true
    got = float(losses.dice_loss(jnp.asarray(true), jnp.asarray(pred)))
    assert 1.9 < got <= 2.0


def test_mse_loss():
    a = jnp.zeros((1, 2, 2, 2))
    b = jnp.ones((1, 2, 2, 2)) * 2
    assert float(losses.mse_loss(a, b)) == 4.0


def test_sobel_like_kernel_values():
    kh, kv = losses._sobel_like_kernels(5)
    kh, kv = np.asarray(kh), np.asarray(kv)
    # kernel_h = h/(h^2+v^2): at (row=0 -> h=-2, col=2 -> v=0): -2/4
    assert np.isclose(kh[0, 2], -0.5)
    assert np.isclose(kh[4, 2], 0.5)
    assert np.isclose(kh[2, 2], 0.0)
    # antisymmetry + transpose relation
    np.testing.assert_allclose(kh, -kh[::-1, :], atol=1e-6)
    np.testing.assert_allclose(kv, kh.T, atol=1e-6)


def test_msge_loss_zero_for_identical():
    rng = np.random.default_rng(1)
    hv = rng.uniform(-1, 1, (2, 8, 8, 2)).astype(np.float32)
    focus = np.ones((2, 8, 8), np.float32)
    got = float(losses.msge_loss(jnp.asarray(hv), jnp.asarray(hv), jnp.asarray(focus)))
    np.testing.assert_allclose(got, 0.0, atol=1e-6)


def test_msge_loss_manual_small():
    """Check conv + masked mean against a scipy correlate computation."""
    from scipy.ndimage import correlate

    rng = np.random.default_rng(2)
    true = rng.uniform(-1, 1, (1, 6, 6, 2)).astype(np.float32)
    pred = rng.uniform(-1, 1, (1, 6, 6, 2)).astype(np.float32)
    focus = (rng.uniform(0, 1, (1, 6, 6)) > 0.5).astype(np.float32)

    kh, kv = losses._sobel_like_kernels(5)
    kh, kv = np.asarray(kh), np.asarray(kv)

    def grad(x):
        dh = correlate(x[0, :, :, 0], kh, mode="constant")
        dv = correlate(x[0, :, :, 1], kv, mode="constant")
        return np.stack([dh, dv], -1)[None]

    err = grad(pred) - grad(true)
    f2 = np.stack([focus, focus], -1)
    expect = (f2 * err * err).sum() / (f2.sum() + 1e-8)
    got = float(
        losses.msge_loss(jnp.asarray(true), jnp.asarray(pred), jnp.asarray(focus))
    )
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_hovernet_loss_aggregation():
    rng = np.random.default_rng(3)
    np_prob = rng.uniform(0.01, 0.99, (1, 8, 8, 2)).astype(np.float32)
    np_prob /= np_prob.sum(-1, keepdims=True)
    hv = rng.uniform(-1, 1, (1, 8, 8, 2)).astype(np.float32)
    true_np = np.eye(2, dtype=np.float32)[rng.integers(0, 2, (1, 8, 8))]
    pred = {"np": jnp.asarray(np_prob), "hv": jnp.asarray(hv)}
    true = {"np": jnp.asarray(true_np), "hv": jnp.asarray(hv)}
    total, terms = losses.hovernet_loss(pred, true, jnp.asarray(true_np[..., 1]))
    assert set(terms) == {
        "loss_np_bce", "loss_np_dice", "loss_hv_mse", "loss_hv_msge", "overall_loss",
    }
    np.testing.assert_allclose(
        float(total),
        float(terms["loss_np_bce"]) + float(terms["loss_np_dice"]),
        rtol=1e-5,
    )  # hv terms are 0 (identical hv)
