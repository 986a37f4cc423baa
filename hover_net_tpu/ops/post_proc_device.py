"""Batched ON-DEVICE post-processing: HV maps -> instance label maps.

This replaces the reference's per-tile host pipeline (cv2/scipy/skimage,
models/hovernet/post_proc.py:26-90) with one jittable function over
[N, H, W, 3] stacks resident in HBM:

  threshold -> CCL -> small-object removal -> Sobel-21 energy ->
  marker extraction (fill-holes + 5x5 ellipse opening + CCL) ->
  marker-based watershed.

The irregular algorithms are reformulated around **segmented
associative scans** — full row/column sweeps per pass instead of
one-pixel-per-step diffusion — because on TPU a lane-parallel scan over
a 1148^2 map costs ~15ms while a 4-neighbour relaxation needs
O(component diameter) full-array sweeps (measured 80x slower):

- **CCL**: labels init to pixel linear indices; alternating segmented
  min-scans along rows/cols (segments = runs of mask) converge in
  O(#zigzag turns of the most serpentine component) passes — 2-3 for
  nuclei blobs, still fast for the giant border-connected background.
- **fill-holes**: CCL of the background + a per-sample scatter table of
  border-touching components.
- **watershed**: parallel watershed by topographic distance. Each pixel
  tracks the lexicographic cost (max energy along path, hop count,
  label); a custom associative operator propagates these costs along
  full rows/columns per scan, alternating directions until fixpoint.
  The hop tie-break reproduces priority-flood's BFS plateau splitting;
  the label tie-break makes results deterministic. Pixel-exactness vs
  the sequential flood is not guaranteed on exact ties; instance-level
  parity is validated against the host oracle in tests (AJI ~0.99).

Output labels are arbitrary unique positive ints per instance (pixel
indices); callers remap to contiguous ids on host if required.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import filters
from .cc_np import ellipse_structuring_element

INT_MAX = jnp.iinfo(jnp.int32).max


# ------------------------------------------------------- segmented scans

def _seg_min_scan(vals, mask, axis: int, reverse: bool = False):
    """Min over the contiguous run of `mask` ending at each position."""
    flags = ~mask

    def op(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, jnp.minimum(va, vb))

    _, v = jax.lax.associative_scan(op, (flags, vals), axis=axis, reverse=reverse)
    return jnp.where(mask, v, vals)


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
    lab0 = jnp.where(mask, idx, INT_MAX)

    def body(state):
        lab, _ = state
        new = _seg_min_scan(lab, mask, axis=2)
        new = _seg_min_scan(new, mask, axis=2, reverse=True)
        new = _seg_min_scan(new, mask, axis=1)
        new = _seg_min_scan(new, mask, axis=1, reverse=True)
        return new, jnp.any(new != lab)

    lab, _ = jax.lax.while_loop(lambda s: s[1], body, (lab0, jnp.bool_(True)))
    return jnp.where(mask, lab, 0).astype(jnp.int32)


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


# ------------------------------------------------------------- watershed

# packed watershed cost word: (minimax level << HOP_BITS) | hop count.
# levels < 256 and hops <= H*W < 2^23 keep the word positive in int32,
# and lexicographic (level, hops) order == integer order on the word.
HOP_BITS = 23
HOP_MASK = (1 << HOP_BITS) - 1


def _ws_scan(cost, lab, energy_sh, mask, axis: int, reverse: bool):
    """One directional relaxation scan of packed watershed costs.

    Summary of a segment: (barrier, max shifted energy, length, best
    exiting (cost, label)) where the best is the min over start points
    inside the segment of their cost propagated to the trailing edge
    (level part maxed with the crossed energies, hop part incremented
    by the crossed length). Associative.
    """
    barrier = ~mask
    seeded = lab > 0
    ok = seeded & ~barrier
    elems = (
        barrier,
        energy_sh,
        jnp.ones_like(energy_sh),
        jnp.where(ok, cost, INT_MAX),
        jnp.where(ok, lab, 0),
    )

    def op(a, b):
        fa, Ma, na, ca, ba = a
        fb, Mb, nb, cb, bb = b
        can = ~fb & (ca != INT_MAX)
        lev_bits = jnp.maximum(ca & ~HOP_MASK, Mb)
        hop_bits = (ca & HOP_MASK) + nb
        cand = jnp.where(can, lev_bits | hop_bits, INT_MAX)
        cl = jnp.where(can, ba, 0)
        take = (cand < cb) | ((cand == cb) & can & (cl < bb))
        return (fa | fb, jnp.maximum(Ma, Mb), na + nb,
                jnp.where(take, cand, cb), jnp.where(take, cl, bb))

    _, _, _, b_cost, b_lab = jax.lax.associative_scan(
        op, elems, axis=axis, reverse=reverse
    )
    has = b_lab > 0
    better = has & ((b_cost < cost) | ((b_cost == cost) & (b_lab < lab)))
    return (jnp.where(better, b_cost, cost),
            jnp.where(better, b_lab, lab))


def watershed_flood(energy_q, markers, mask, num_levels: int = 256):
    """Marker-based watershed by minimax (topographic) path cost.

    Alternating directional relaxation scans until fixpoint; the hop
    count packed into the low cost bits reproduces priority-flood's BFS
    plateau splitting, the final label comparison makes ties fully
    deterministic.

    energy_q: [N,H,W] int32 quantised energy (0..num_levels-1)
    markers:  [N,H,W] int32 labels (0 = unlabeled)
    mask:     [N,H,W] bool flood region
    """
    assert num_levels <= 256
    seeded = (markers > 0) & mask
    lab0 = jnp.where(seeded, markers, 0).astype(jnp.int32)
    energy_sh = (energy_q << HOP_BITS).astype(jnp.int32)
    # marker pixels carry their own energy as the path cost so far
    cost0 = jnp.where(seeded, energy_sh, INT_MAX).astype(jnp.int32)

    def body(state):
        cost, lab, _ = state
        nc, nb = cost, lab
        nc, nb = _ws_scan(nc, nb, energy_sh, mask, axis=2, reverse=False)
        nc, nb = _ws_scan(nc, nb, energy_sh, mask, axis=2, reverse=True)
        nc, nb = _ws_scan(nc, nb, energy_sh, mask, axis=1, reverse=False)
        nc, nb = _ws_scan(nc, nb, energy_sh, mask, axis=1, reverse=True)
        changed = jnp.any(nb != lab) | jnp.any(nc != cost)
        return nc, nb, changed

    cost, lab, _ = jax.lax.while_loop(
        lambda s: s[2], body, (cost0, lab0, jnp.bool_(True))
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
    h, w = pred.shape[1], pred.shape[2]
    if _post_proc_mode(h, w) == "fulltail":
        from .post_proc_pallas import proc_np_hv_blocked

        if max(h, w) <= 512:
            # the whole map fits one VMEM window: halo 0 makes the
            # blocked solve EXACT (no seams), and the (8,128)-aligned
            # core bounds the padding waste
            core = max(-(-max(h, w) // 128) * 128, 128)
            halo = 0
        else:
            import os

            geom = os.environ.get("HNT_PP_GEOM")
            if geom:
                core, halo = (int(v) for v in geom.split(","))
            else:
                core, halo = 256, 128
        return proc_np_hv_blocked(
            pred, valid_mask, num_levels=num_levels,
            marker_min_size=marker_min_size, blob_min_size=blob_min_size,
            core=core, halo=halo,
        )
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


def _post_proc_mode(h: int, w: int) -> str:
    """On TPU the whole irregular tail (CCL, small-object removal,
    fill-holes, opening, watershed) runs inside ONE blocked-VMEM Pallas
    kernel (ops/post_proc_pallas.py) — measured 2.1x faster standalone
    (103 vs 220 ms at 1148^2) and 1.7x faster fused into the tile
    program (3.50 vs 2.02 tiles/s) than the HBM segmented-scan path.
    Non-TPU backends and HNT_NO_PALLAS=1 use the all-XLA scan
    formulation (exact same instance semantics, portable)."""
    import os

    if os.environ.get("HNT_NO_PALLAS"):
        return "scan"
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return "scan"
    if platform not in ("tpu", "axon"):
        return "scan"
    return "fulltail"
