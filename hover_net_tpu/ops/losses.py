"""HoVer-Net training losses, pure jnp over NHWC tensors.

Numerically equivalent to models/hovernet/utils.py:54-172 in the
reference; all four terms verified against hand-computed values in
tests/test_losses.py.

Quirk preserved on purpose: `msge_loss` applies the *horizontal* kernel to
channel 0 and the *vertical* kernel to channel 1 — the reference docstring
says the opposite of what its code does (utils.py:106-162); we keep the
code behaviour.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def xentropy_loss(true, pred, reduction: str = "mean"):
    """Manual CE over softmaxed predictions, NHWC (utils.py:54-72).

    `pred` must already be post-softmax probabilities.
    """
    epsilon = 1.0e-7  # 10e-8 in the reference
    pred = pred / jnp.sum(pred, axis=-1, keepdims=True)
    pred = jnp.clip(pred, epsilon, 1.0 - epsilon)
    loss = -jnp.sum(true * jnp.log(pred), axis=-1, keepdims=True)
    return jnp.mean(loss) if reduction == "mean" else jnp.sum(loss)


def dice_loss(true, pred, smooth: float = 1.0e-3):
    """Per-channel soft dice summed over channels (utils.py:76-83)."""
    inse = jnp.sum(pred * true, axis=(0, 1, 2))
    l = jnp.sum(pred, axis=(0, 1, 2))
    r = jnp.sum(true, axis=(0, 1, 2))
    loss = 1.0 - (2.0 * inse + smooth) / (l + r + smooth)
    return jnp.sum(loss)


def mse_loss(true, pred):
    return jnp.mean((pred - true) ** 2)


@functools.lru_cache(maxsize=None)
def _sobel_like_kernels(size: int):
    """h/(h^2+v^2) 'Sobel-like' gradient kernels (utils.py:124-145).

    Returns NumPy arrays (safe to cache across jit traces).
    """
    assert size % 2 == 1
    import numpy as np

    rng = np.arange(-(size // 2), size // 2 + 1, dtype=np.float32)
    # torch.meshgrid default is 'ij': h varies along rows
    h, v = np.meshgrid(rng, rng, indexing="ij")
    kernel_h = h / (h * h + v * v + 1.0e-15)
    kernel_v = v / (h * h + v * v + 1.0e-15)
    return kernel_h, kernel_v


def _conv2d_single(x_nhw, kernel):
    """SAME conv of one-channel NHW stack with a kxk kernel."""
    x = x_nhw[..., None]  # NHWC
    k = kernel[:, :, None, None]  # HWIO
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[..., 0]


def gradient_hv(hv):
    """Per-channel directional gradients of the NHWC(2) hv map
    (utils.py:148-162: kernel_h on ch0, kernel_v on ch1)."""
    kernel_h, kernel_v = _sobel_like_kernels(5)
    dh = _conv2d_single(hv[..., 0], kernel_h)
    dv = _conv2d_single(hv[..., 1], kernel_v)
    return jnp.stack([dh, dv], axis=-1)


def msge_loss(true, pred, focus):
    """Masked MSE of hv gradients inside nuclei (utils.py:106-172).

    focus: NHW float/bool mask (the positive NP channel).
    """
    focus = focus.astype(pred.dtype)[..., None]
    focus = jnp.concatenate([focus, focus], axis=-1)
    err = gradient_hv(pred) - gradient_hv(true)
    loss = focus * (err * err)
    return jnp.sum(loss) / (jnp.sum(focus) + 1.0e-8)


LOSS_FNS = {
    "bce": xentropy_loss,
    "dice": dice_loss,
    "mse": mse_loss,
    "msge": msge_loss,
}

# loss weights per branch (models/hovernet/opt.py:47-52)
DEFAULT_LOSS_WEIGHTS = {
    "np": {"bce": 1.0, "dice": 1.0},
    "hv": {"mse": 1.0, "msge": 1.0},
    "tp": {"bce": 1.0, "dice": 1.0},
}


def hovernet_loss(pred_dict, true_dict, focus, weights=None):
    """Total weighted loss + per-term scalars (run_desc.py:67-79).

    pred_dict: post-softmax np/tp probs + raw hv. true_dict: one-hot
    np/tp + hv. focus: positive-class NP mask (NHW).
    """
    weights = weights or DEFAULT_LOSS_WEIGHTS
    terms = {}
    total = 0.0
    for branch, branch_losses in weights.items():
        if branch not in pred_dict:
            continue
        for name, w in branch_losses.items():
            fn = LOSS_FNS[name]
            if name == "msge":
                val = fn(true_dict[branch], pred_dict[branch], focus)
            else:
                val = fn(true_dict[branch], pred_dict[branch])
            terms[f"loss_{branch}_{name}"] = val
            total = total + w * val
    terms["overall_loss"] = total
    return total, terms
