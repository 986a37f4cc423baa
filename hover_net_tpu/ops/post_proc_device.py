"""Batched ON-DEVICE post-processing: HV maps -> instance label maps.

This replaces the reference's per-tile host pipeline (cv2/scipy/skimage,
models/hovernet/post_proc.py:26-90) with one jittable function over
[N, H, W, 3] stacks resident in HBM:

  threshold -> CCL -> small-object removal -> Sobel-21 energy ->
  marker extraction (fill-holes + 5x5 ellipse opening + CCL) ->
  level-synchronised flood watershed.

Algorithms are reformulated for a SIMD machine:

- **CCL**: iterative 4-neighbour min-propagation fused with pointer
  doubling (labels are pixel linear indices, so a label IS an address:
  `label <- label[label]` jumps along the union-find chain). Converges in
  O(log diameter) sweeps inside a single `lax.while_loop`.
- **fill-holes**: label the background, build a per-sample table of
  border-touching background components with a scatter, fill the rest.
- **watershed**: quantise the energy to 256 levels and flood markers
  level-by-level; within a level, wavefronts advance one 4-neighbour
  step per sweep until no pixel changes, then the water level rises.
  Ties where two wavefronts meet in the same sweep resolve to the
  smaller label — deterministic. Pixel-exactness vs the sequential
  priority-flood is not guaranteed on plateaus; instance-level parity is
  validated in tests and on CoNSeP metrics.

Output labels are arbitrary unique positive ints per instance (pixel
indices); callers remap to contiguous ids on host if required.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import filters
from .cc_np import ellipse_structuring_element

INT_MAX = jnp.iinfo(jnp.int32).max


def _neighbor_min(x, big):
    """4-neighbour minimum (values `big` used for out-of-bounds)."""
    up = jnp.concatenate([x[:, :1] * 0 + big, x[:, :-1]], axis=1)
    down = jnp.concatenate([x[:, 1:], x[:, :1] * 0 + big], axis=1)
    left = jnp.concatenate([x[:, :, :1] * 0 + big, x[:, :, :-1]], axis=2)
    right = jnp.concatenate([x[:, :, 1:], x[:, :, :1] * 0 + big], axis=2)
    return jnp.minimum(jnp.minimum(up, down), jnp.minimum(left, right))


def connected_components(mask):
    """Label 4-connected components of a boolean [N, H, W] stack.

    Returns int32 labels in [0, H*W]; 0 = background. Label values are
    (1 + linear index of the component's minimum pixel).
    """
    n, h, w = mask.shape
    idx = (
        jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 1) * w
        + jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 2)
        + 1
    )
    labels = jnp.where(mask, idx, INT_MAX)

    def compress(lab):
        """Pointer jump: label <- label at the pixel the label names."""
        flat = lab.reshape(n, h * w)
        ptr = jnp.clip(flat - 1, 0, h * w - 1)
        jumped = jnp.take_along_axis(flat, ptr, axis=1)
        return jnp.where(flat != INT_MAX, jumped, INT_MAX).reshape(n, h, w)

    def body(state):
        lab, _ = state
        new = jnp.minimum(lab, _neighbor_min(lab, INT_MAX))
        new = jnp.where(mask, new, INT_MAX)
        new = compress(compress(new))
        changed = jnp.any(new != lab)
        return new, changed

    def cond(state):
        return state[1]

    labels, _ = jax.lax.while_loop(cond, body, (labels, jnp.bool_(True)))
    return jnp.where(mask, labels, 0).astype(jnp.int32)


def component_sizes(labels, num_bins):
    """Per-sample histogram of label values. labels [N,H,W] int32 in
    [0, num_bins)."""
    n = labels.shape[0]
    flat = labels.reshape(n, -1)
    one = jnp.ones_like(flat, jnp.int32)

    def hist(lbl, ones):
        return jnp.zeros((num_bins,), jnp.int32).at[lbl].add(ones)

    return jax.vmap(hist)(flat, one)


def remove_small(labels, min_size, num_bins):
    sizes = component_sizes(labels, num_bins)
    n = labels.shape[0]
    keep = sizes >= min_size
    keep = keep.at[:, 0].set(False)
    flat = labels.reshape(n, -1)
    kept = jnp.take_along_axis(keep, flat, axis=1)
    return jnp.where(kept.reshape(labels.shape), labels, 0)


def fill_holes(mask):
    """Fill background regions not connected to the border
    (scipy.ndimage.binary_fill_holes equivalent, 4-connectivity)."""
    n, h, w = mask.shape
    bg_labels = connected_components(~mask)
    flat = bg_labels.reshape(n, -1)
    border = jnp.zeros((h, w), bool).at[0, :].set(True).at[-1, :].set(True)
    border = border.at[:, 0].set(True).at[:, -1].set(True)
    border = jnp.broadcast_to(border.reshape(1, -1), flat.shape)

    def touch_table(lbl, brd):
        return jnp.zeros((h * w + 1,), bool).at[jnp.where(brd, lbl, 0)].set(True)

    touches = jax.vmap(touch_table)(flat, border)
    is_outside = jnp.take_along_axis(touches, flat, axis=1).reshape(mask.shape)
    return mask | (~mask & ~is_outside)


def _shift(x, dy, dx, fill):
    """Shift [N,H,W] by (dy, dx), filling exposed cells."""
    if dy == -1:
        x = jnp.concatenate([x[:, 1:], jnp.full_like(x[:, :1], fill)], axis=1)
    elif dy == 1:
        x = jnp.concatenate([jnp.full_like(x[:, :1], fill), x[:, :-1]], axis=1)
    if dx == -1:
        x = jnp.concatenate([x[:, :, 1:], jnp.full_like(x[:, :, :1], fill)], axis=2)
    elif dx == 1:
        x = jnp.concatenate([jnp.full_like(x[:, :, :1], fill), x[:, :, :-1]], axis=2)
    return x


def watershed_flood(energy_q, markers, mask, num_levels: int = 256):
    """Marker-based watershed as a minimax-path relaxation.

    Each masked pixel is assigned the marker with the lexicographically
    smallest (max energy along path, hop count, label) — the parallel
    (order-independent) formulation of watershed by topographic
    distance. The hop tie-break reproduces priority-flood's BFS
    plateau splitting; the final label tie-break makes results fully
    deterministic. Converges in O(longest flood path) sweeps inside one
    `lax.while_loop` — no data-dependent host control flow.

    energy_q: [N,H,W] int32 quantised energy (0..num_levels-1)
    markers:  [N,H,W] int32 labels (0 = unlabeled)
    mask:     [N,H,W] bool flood region
    """
    seeded = (markers > 0) & mask
    lab0 = jnp.where(seeded, markers, 0).astype(jnp.int32)
    lev0 = jnp.where(seeded, energy_q, INT_MAX).astype(jnp.int32)
    hop0 = jnp.where(seeded, 0, INT_MAX).astype(jnp.int32)

    def body(state):
        lab, lev, hop, _ = state
        best_lab, best_lev, best_hop = lab, lev, hop
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            q_lab = _shift(lab, dy, dx, 0)
            q_lev = _shift(lev, dy, dx, INT_MAX)
            q_hop = _shift(hop, dy, dx, INT_MAX)
            has = q_lab > 0
            n_lev = jnp.where(has, jnp.maximum(energy_q, q_lev), INT_MAX)
            n_hop = jnp.where(has, q_hop + 1, INT_MAX)
            better = (n_lev < best_lev) | (
                (n_lev == best_lev)
                & ((n_hop < best_hop)
                   | ((n_hop == best_hop) & (q_lab < best_lab) & has))
            )
            best_lab = jnp.where(better, q_lab, best_lab)
            best_lev = jnp.where(better, n_lev, best_lev)
            best_hop = jnp.where(better, n_hop, best_hop)
        # markers keep their identity; flooding restricted to mask
        upd = mask & ~seeded
        new_lab = jnp.where(upd, best_lab, lab)
        new_lev = jnp.where(upd, best_lev, lev)
        new_hop = jnp.where(upd, best_hop, hop)
        changed = jnp.any((new_lab != lab) | (new_lev != lev) | (new_hop != hop))
        return new_lab, new_lev, new_hop, changed

    def cond(state):
        return state[3]

    lab, _, _, _ = jax.lax.while_loop(
        cond, body, (lab0, lev0, hop0, jnp.bool_(True))
    )
    return jnp.where(mask, lab, 0)


@functools.partial(jax.jit, static_argnames=("num_levels", "marker_min_size", "blob_min_size"))
def proc_np_hv_batch(pred, valid_mask=None, num_levels: int = 256,
                     marker_min_size: int = 10, blob_min_size: int = 10):
    """Batched __proc_np_hv (post_proc.py:26-90): [N,H,W,3] -> [N,H,W] int32.

    Channels: 0 nuclei prob, 1 horizontal, 2 vertical.

    valid_mask ([N,H,W] bool, optional): restricts nuclei to the source
    image region when `pred` carries reflect-padding beyond it (the
    padded area still feeds the Sobel window like cv2's reflected
    border, but can't spawn instances).
    """
    pred = pred.astype(jnp.float32)
    n, h, w, _ = pred.shape
    num_bins = h * w + 1

    blb = pred[..., 0] >= 0.5
    if valid_mask is not None:
        blb = blb & valid_mask
    blb_lab = connected_components(blb)
    blb_lab = remove_small(blb_lab, blob_min_size, num_bins)
    blb = blb_lab > 0
    blb_f = blb.astype(jnp.float32)

    h_dir = filters.minmax_norm(pred[..., 1])
    v_dir = filters.minmax_norm(pred[..., 2])
    sobelh = 1.0 - filters.minmax_norm(filters.sobel_h(h_dir, 21))
    sobelv = 1.0 - filters.minmax_norm(filters.sobel_v(v_dir, 21))

    overall = jnp.maximum(sobelh, sobelv)
    overall = overall - (1.0 - blb_f)
    overall = jnp.maximum(overall, 0.0)

    dist = (1.0 - overall) * blb_f
    dist = -filters.gaussian_blur_3x3(dist)

    marker = blb_f - (overall >= 0.4).astype(jnp.float32)
    marker = marker > 0.5
    marker = fill_holes(marker)
    selem = ellipse_structuring_element(5, 5)
    marker = filters.dilate(filters.erode(marker, selem), selem)
    marker_lab = connected_components(marker)
    marker_lab = remove_small(marker_lab, marker_min_size, num_bins)

    # quantise energy: dist in [-1, 0] -> integer levels, preserving order
    lo = jnp.min(dist, axis=(1, 2), keepdims=True)
    hi = jnp.max(dist, axis=(1, 2), keepdims=True)
    scale = jnp.where(hi > lo, (num_levels - 1) / (hi - lo), 0.0)
    energy_q = jnp.round((dist - lo) * scale).astype(jnp.int32)

    return watershed_flood(energy_q, marker_lab, blb, num_levels)
