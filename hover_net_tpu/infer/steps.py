"""Jitted inference building blocks.

Output contract matches run_desc.py:171-197: per-pixel channel concat of
[tp argmax (if typed), np foreground prob, hv_x, hv_y] in NHWC — the
layout every downstream consumer (post-proc, writers) expects.

TPU-first: patch extraction is a device-side gather from a padded image
already resident in HBM (one host->device transfer per image/chunk, not
per patch), and the forward runs in bfloat16 with float32 heads.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.hovernet import HoVerNet


def infer_output(model: HoVerNet, variables, imgs):
    """Forward + head activations -> [N, h, w, C] concat."""
    out = model.apply(variables, imgs, train=False)
    parts = []
    if "tp" in out:
        tp = jnp.argmax(jax.nn.softmax(out["tp"], axis=-1), axis=-1)
        parts.append(tp[..., None].astype(jnp.float32))
    np_prob = jax.nn.softmax(out["np"], axis=-1)[..., 1:2]
    parts.append(np_prob)
    parts.append(out["hv"].astype(jnp.float32))
    return jnp.concatenate(parts, axis=-1)


def make_infer_step(model: HoVerNet):
    """jit-compiled (variables, imgs[N,H,W,3]) -> [N,h,w,C]."""

    @jax.jit
    def step(variables, imgs):
        return infer_output(model, variables, imgs)

    return step


@functools.partial(jax.jit, static_argnames=("size",))
def extract_patches(padded_img, coords, size: int):
    """Gather [K, size, size, 3] windows from a device-resident image.

    padded_img: [H, W, 3] float/uint8; coords: [K, 2] int32 top-lefts.
    """

    def one(c):
        return jax.lax.dynamic_slice(
            padded_img, (c[0], c[1], 0), (size, size, padded_img.shape[-1])
        )

    return jax.vmap(one)(coords)


@functools.partial(jax.jit, static_argnames=("grid", "valid_hw"))
def assemble_grid(patch_out, grid, valid_hw=None):
    """[R*C, h, w, ch] patch outputs -> [R*h, C*w, ch] map (row-major
    grid), optionally cropped to valid_hw. Mirrors the reshape-stitch in
    infer/tile.py:111-131 but stays on device."""
    r, c = grid
    k, h, w, ch = patch_out.shape
    assert k == r * c, (k, r, c)
    m = patch_out.reshape(r, c, h, w, ch)
    m = m.transpose(0, 2, 1, 3, 4).reshape(r * h, c * w, ch)
    if valid_hw is not None:
        m = m[: valid_hw[0], : valid_hw[1]]
    return m
