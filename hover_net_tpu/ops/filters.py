"""Separable image filters for the device post-processing pipeline.

Kernel constructions reproduce OpenCV's derivative/Gaussian kernels
exactly so the device pipeline matches the host oracle
(post_proc.py:56-76 uses cv2.Sobel ksize=21 and cv2.GaussianBlur (3,3)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def sobel_kernels(ksize: int):
    """(deriv, smooth) 1-D correlation kernels of cv2.getDerivKernels.

    OpenCV builds them from binomial factors: smooth = [1,1]^(k-1),
    deriv = [1,1]^(k-2) * [-1,1] (as correlation templates).
    """
    deriv = np.array([1.0])
    for _ in range(ksize - 2):
        deriv = np.convolve(deriv, [1.0, 1.0])
    deriv = np.convolve(deriv, [-1.0, 1.0])
    smooth = np.array([1.0])
    for _ in range(ksize - 1):
        smooth = np.convolve(smooth, [1.0, 1.0])
    return deriv.astype(np.float32), smooth.astype(np.float32)


def _sep_filter(x, krow, kcol):
    """Separable correlation over the last two dims of [N, H, W] with
    REFLECT_101 borders (cv2 default).

    precision=HIGHEST is load-bearing: TPU MXU convs at DEFAULT
    precision run f32 data through bf16 passes, which puts ~8e-3 of
    noise on the min-max-normalised Sobel energy — enough to flip
    ~1.5k `overall >= 0.4` marker pixels per dense 1000^2 tile,
    merging/splitting markers (measured tile 12 of the round-4 drift
    sweep: 1446 threshold flips at DEFAULT, 0 at f32, maxdiff 2.4e-7
    vs the cv2 f64 oracle — one of the TWO mechanisms behind that
    sweep's AJI-0.746 tail; the other, larger one was canvas-wide
    min-max normalisation of the Sobel response over the mirrored
    canonical map, fixed by minmax_norm(where=valid) in
    post_proc_device/pallas). Full-precision f32 here costs ~0.1
    GFLOP per tile — three orders below the watershed."""
    prec = jax.lax.Precision.HIGHEST
    pr = len(krow) // 2
    pc = len(kcol) // 2
    x = jnp.pad(x, ((0, 0), (pr, pr), (0, 0)), mode="reflect")
    # correlate rows (axis 1) with krow
    x = jax.lax.conv_general_dilated(
        x[..., None], jnp.asarray(krow, x.dtype)[:, None, None, None],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec,
    )[..., 0]
    x = jnp.pad(x, ((0, 0), (0, 0), (pc, pc)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        x[..., None], jnp.asarray(kcol, x.dtype)[None, :, None, None],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec,
    )[..., 0]
    return x


def sobel_h(x, ksize: int = 21):
    """cv2.Sobel(x, dx=1, dy=0): derivative along columns (x), smoothing
    along rows (y). x: [N, H, W]."""
    deriv, smooth = sobel_kernels(ksize)
    return _sep_filter(x, smooth, deriv)


def sobel_v(x, ksize: int = 21):
    """cv2.Sobel(x, dx=0, dy=1)."""
    deriv, smooth = sobel_kernels(ksize)
    return _sep_filter(x, deriv, smooth)


def gaussian_blur_3x3(x):
    """cv2.GaussianBlur(x, (3,3), 0): fixed [1,2,1]/4 separable kernel."""
    k = np.array([0.25, 0.5, 0.25], np.float32)
    return _sep_filter(x, k, k)


def minmax_norm(x, axes=(-2, -1), where=None):
    """Per-sample min-max to [0,1]; constant inputs -> 0 (cv2.normalize
    NORM_MINMAX semantics).

    where (bool, broadcastable to x): restrict the min/max statistics
    to these elements (values elsewhere still map through the affine
    transform and may leave [0,1]). Load-bearing for parity on the
    mirrored canonical canvas: an odd-derivative response (Sobel) of
    mirrored content is SIGN-FLIPPED relative to the source, so a
    canvas-wide min/max sees values the source region never produced
    and shifts the normalisation — measured on drift tile 12, that
    alone merged 1433 host markers into 1291 (the round-4 sweep's
    AJI-0.746 dense-tile tail). The host oracle (post_proc.py:56-60)
    normalises over exactly the source crop; `where=valid` reproduces
    that."""
    if where is not None:
        lo = jnp.min(x, axis=axes, keepdims=True, where=where,
                     initial=jnp.inf)
        hi = jnp.max(x, axis=axes, keepdims=True, where=where,
                     initial=-jnp.inf)
    else:
        lo = jnp.min(x, axis=axes, keepdims=True)
        hi = jnp.max(x, axis=axes, keepdims=True)
    rng = hi - lo
    return jnp.where(rng > 1e-12, (x - lo) / jnp.where(rng > 0, rng, 1.0), 0.0)


def box_count(mask, selem):
    """Count of structuring-element hits at each pixel; mask [N, H, W]
    0/1 float, selem 2-D 0/1 array; outside-of-image contributes
    `pad_value`."""
    kh, kw = selem.shape
    k = jnp.asarray(selem, jnp.float32)[:, :, None, None]
    # 0/1 products with sums <= |selem| are exact even in bf16 MXU
    # passes, but pin HIGHEST anyway — the cost is noise and it keeps
    # every thresholded conv in this module out of precision trouble
    return jax.lax.conv_general_dilated(
        mask[..., None].astype(jnp.float32), k,
        window_strides=(1, 1), padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )[..., 0]


def erode(mask, selem, border_foreground: bool = True):
    """Binary erosion. border_foreground=True matches cv2.erode's default
    (+inf border => border pixels don't erode from outside)."""
    if border_foreground:
        ph, pw = selem.shape[0] // 2, selem.shape[1] // 2
        padded = jnp.pad(
            mask.astype(jnp.float32), ((0, 0), (ph, ph), (pw, pw)),
            constant_values=1.0,
        )
        cnt = jax.lax.conv_general_dilated(
            padded[..., None], jnp.asarray(selem, jnp.float32)[:, :, None, None],
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST,
        )[..., 0]
    else:
        cnt = box_count(mask, selem)
    return cnt >= float(np.sum(selem)) - 0.5


def dilate(mask, selem):
    return box_count(mask, selem) > 0.5
