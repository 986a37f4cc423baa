"""Pallas TPU kernel: the ENTIRE irregular post-proc tail in VMEM.

The HBM-scan pipeline (ops/post_proc_device.py) spends most of its time
in the prep stages — 3 CCLs, 2 small-object removals, fill-holes — each
a fixpoint of full-map segmented scans round-tripping HBM. This module
runs everything after the Sobel energy (blob CCL + cleanup, marker
derivation, fill-holes, 5x5 opening, marker CCL + cleanup, watershed)
inside ONE Pallas kernel over halo-padded VMEM windows:

- windows are `core + 2*halo` squares DMA'd from HBM (overlapping reads,
  no XLA gather duplication); each program writes one `core` x `core`
  output block;
- component labels are global-padded-map linear indices, so labels agree
  across windows and cores stitch without a merge step;
- every run of mask pixels in a row belongs to one component, so all
  fixpoints (CCL min-label, outside-flood for fill-holes, watershed
  minimax costs) run as Hillis-Steele doubling scans along rows/columns
  — log2(win) shifted combines per direction, pure VPU work on VMEM
  (jax.lax.associative_scan itself does not lower inside Mosaic);
- small-object removal (min_size=10) is EXACT without histograms: a
  connected component has < `min_size` pixels iff the same-label count
  within the Manhattan-radius-(min_size-1) diamond is < min_size (BFS
  depth k from any member covers >= k+1 member pixels).

Correctness contract (tests/test_post_proc_pallas.py): components whose
extent fits the halo are labelled identically to the whole-map solve;
larger ones may split at seams (instance-level AJI >= 0.99 vs the host
oracle on nuclei content). Energy quantisation uses the fixed [-1, 0]
range of `dist` (post_proc.py:66-69 arithmetic keeps dist in [-1, 0])
instead of the per-map min/max, making windows self-contained.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import filters
from .cc_np import ellipse_structuring_element
from .post_proc_device import (
    HOP_BITS, HOP_MASK, INT_MAX, NUM_LEVELS, cross_cost,
)

# core/halo both 128-aligned: Mosaic requires the output block's last
# two dims divisible by (8, 128); halo 128 also widens the exactness
# bound (components with extent <= halo label identically to the
# whole-map solve)
CORE = 256
HALO = 128
WIN = CORE + 2 * HALO  # 512


# ------------------------------------------------------ in-kernel shifts

def _shift(x, d: int, axis: int, fill):
    """Shift x by +d (bring x[i-d] to i) or -d along axis, filling with
    `fill` (static d)."""
    if d == 0:
        return x
    f = jnp.full_like(x[:abs(d)] if axis == 0 else x[:, :abs(d)], fill)
    if axis == 0:
        return (jnp.concatenate([f, x[:-d]], 0) if d > 0
                else jnp.concatenate([x[-d:], f], 0))
    return (jnp.concatenate([f, x[:, :-d]], 1) if d > 0
            else jnp.concatenate([x[:, -d:], f], 1))


def _hs_scan(elems, op, identity, axis: int, reverse: bool, n: int):
    """Hillis-Steele inclusive scan of an associative `op` over tuples of
    arrays. Forward: position i = op over [0..i] segmented combine;
    reverse: over [i..n-1]."""
    d = 1
    while d < n:
        dd = -d if reverse else d
        shifted = tuple(
            _shift(e, dd, axis, ident) for e, ident in zip(elems, identity)
        )
        elems = op(shifted, elems)
        d *= 2
    return elems


# NOTE: every mask/flag array that gets shifted or carried through a
# while_loop is int32 0/1, not bool — Mosaic crashes on concatenated /
# loop-carried i1 vectors (verified on hardware); compares feeding
# jnp.where directly are fine.

def _seg_min_scan(vals, mask, axis: int, reverse: bool, n: int):
    """Min over the contiguous run of mask (int32 0/1) ending at each
    position (in scan direction)."""
    flags = 1 - mask

    def op(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb > 0, vb, jnp.minimum(va, vb))

    _, v = _hs_scan((flags, vals), op, (1, INT_MAX), axis, reverse, n)
    return jnp.where(mask > 0, v, vals)


def _ccl_fixpoint(mask, idx, n: int):
    """4-connected component labels = min global index, via alternating
    segmented scans to fixpoint. mask: int32 0/1."""
    lab0 = jnp.where(mask > 0, idx, INT_MAX)

    def body(state):
        lab, _ = state
        new = _seg_min_scan(lab, mask, 1, False, n)
        new = _seg_min_scan(new, mask, 1, True, n)
        new = _seg_min_scan(new, mask, 0, False, n)
        new = _seg_min_scan(new, mask, 0, True, n)
        return new, jnp.any(new != lab)

    lab, _ = jax.lax.while_loop(lambda s: s[1], body, (lab0, jnp.bool_(True)))
    return jnp.where(mask > 0, lab, 0)


def _remove_small(lab, min_size: int):
    """Exact small-component removal: same-label count over the Manhattan
    diamond of radius min_size-1."""
    r = min_size - 1
    cnt = jnp.zeros(lab.shape, jnp.int32)
    for dy in range(-r, r + 1):
        row = _shift(lab, dy, 0, 0)
        m = r - abs(dy)
        # incremental horizontal shifts reuse the previous one
        left = row
        right = row
        cnt = cnt + (row == lab).astype(jnp.int32)
        for dx in range(1, m + 1):
            left = _shift(left, 1, 1, 0)
            right = _shift(right, -1, 1, 0)
            cnt = cnt + (left == lab).astype(jnp.int32)
            cnt = cnt + (right == lab).astype(jnp.int32)
    keep = (lab > 0) & (cnt >= min_size)
    return jnp.where(keep, lab, 0)


def _fill_holes(mask, n: int):
    """Fill bg regions not connected to the window border (4-conn).
    mask: int32 0/1; returns int32 0/1."""
    bg = 1 - mask
    h, w = mask.shape
    ri = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    border = ((ri == 0) | (ri == h - 1) | (ci == 0)
              | (ci == w - 1)).astype(jnp.int32)
    out0 = bg * border

    def seg_or(out, axis, reverse):
        flags = mask

        def op(a, b):
            fa, oa = a
            fb, ob = b
            return fa | fb, jnp.where(fb > 0, ob, oa | ob)

        _, o = _hs_scan((flags, out), op, (1, 0), axis, reverse, n)
        return jnp.where(bg > 0, o, out)

    def body(state):
        out, _ = state
        new = seg_or(out, 1, False)
        new = seg_or(new, 1, True)
        new = seg_or(new, 0, False)
        new = seg_or(new, 0, True)
        return new, jnp.any(new != out)

    outside, _ = jax.lax.while_loop(
        lambda s: s[1], body, (out0, jnp.bool_(True))
    )
    return mask | (bg * (1 - outside))


def _selem_count(mask, selem, fill: int):
    """Structuring-element hit count by explicit shifts (selem small
    static 0/1 numpy array)."""
    kh, kw = selem.shape
    cy, cx = kh // 2, kw // 2
    cnt = jnp.zeros(mask.shape, jnp.int32)
    m = mask.astype(jnp.int32)
    for dy in range(kh):
        for dx in range(kw):
            if not selem[dy, dx]:
                continue
            s = _shift(m, cy - dy, 0, fill)
            s = _shift(s, cx - dx, 1, fill)
            cnt = cnt + s
    return cnt


def _ws_cost_sweep(cost, energy_sh, mask):
    """One synchronous 4-neighbour cost relaxation step (VPU only; the
    VMEM-resident formulation that is known to fit Mosaic's scoped-vmem
    budget — HS scans of the full watershed state blow it). Crossing
    rule matches post_proc_device._ws_scan: the hop count RESETS on a
    strict ascent (isotone cost; plateau-geodesic tie semantics).
    mask: int32 0/1."""
    best_c = cost
    for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        q_c = _shift(cost, dy, 0, INT_MAX) if dy else cost
        q_c = _shift(q_c, dx, 1, INT_MAX) if dx else q_c
        best_c = jnp.minimum(best_c, cross_cost(q_c, energy_sh))
    return jnp.where(mask > 0, best_c, cost)


def _ws_label_sweep(sec, lab, cost, energy_sh, mask):
    """Tie-resolution relaxation on the fixed optimal costs: along
    cost-attaining edges, minimise (total hops from the marker, marker
    label) — the canonical history-free fixpoint shared with
    post_proc_device.watershed_flood."""
    best_s, best_l = sec, lab
    for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        q_c = _shift(cost, dy, 0, INT_MAX) if dy else cost
        q_c = _shift(q_c, dx, 1, INT_MAX) if dx else q_c
        q_s = _shift(best_s, dy, 0, INT_MAX) if dy else best_s
        q_s = _shift(q_s, dx, 1, INT_MAX) if dx else q_s
        q_l = _shift(best_l, dy, 0, 0) if dy else best_l
        q_l = _shift(q_l, dx, 1, 0) if dx else q_l
        has = (q_l > 0) & (q_c != INT_MAX) & (q_s != INT_MAX)
        offer = has & (cross_cost(q_c, energy_sh) == cost)
        s_c = jnp.where(offer, q_s + 1, INT_MAX)
        take = offer & ((s_c < best_s) | ((s_c == best_s) & (q_l < best_l)))
        best_s = jnp.where(take, s_c, best_s)
        best_l = jnp.where(take, q_l, best_l)
    inside = mask > 0
    return (jnp.where(inside, best_s, sec),
            jnp.where(inside, best_l, lab))


def _watershed(energy_q, markers, mask, n: int):
    """Two-phase canonical watershed solve (identical result to
    post_proc_device.watershed_flood and a sequential label-relax solve):
    cost relaxation to the exact isotone fixpoint, then min-label
    propagation along optimal edges. mask: int32 0/1. Convergence is
    bounded by the largest blob's path length inside the window —
    nuclei diameters in practice."""
    seeded = (markers > 0) & (mask > 0)
    lab0 = jnp.where(seeded, markers, 0)
    energy_sh = energy_q << HOP_BITS
    cost0 = jnp.where(seeded, energy_sh, INT_MAX)

    def cost_body(state):
        cost, _ = state
        nc = _ws_cost_sweep(cost, energy_sh, mask)
        return nc, jnp.any(nc != cost)

    cost, _ = jax.lax.while_loop(
        lambda s: s[1], cost_body, (cost0, jnp.bool_(True))
    )

    sec0 = jnp.where(seeded, 0, INT_MAX)

    def lab_body(state):
        sec, lab, _ = state
        ns, nb = _ws_label_sweep(sec, lab, cost, energy_sh, mask)
        return ns, nb, jnp.any(nb != lab) | jnp.any(ns != sec)

    _, lab, _ = jax.lax.while_loop(
        lambda s: s[2], lab_body, (sec0, lab0, jnp.bool_(True))
    )
    return jnp.where(mask > 0, lab, 0)


# ---------------------------------------------------------------- kernel

def _make_kernel(padded_w: int, img_h: int, img_w: int, num_levels: int,
                 marker_min_size: int, blob_min_size: int, win: int,
                 core: int, halo: int):
    selem = ellipse_structuring_element(5, 5)
    selem_total = int(selem.sum())

    def kernel(blb_hbm, sob_hbm, out_ref):
        bi = pl.program_id(0)
        by = pl.program_id(1)
        bx = pl.program_id(2)
        oy = by * core
        ox = bx * core

        def run(blb_v, sob_v, sem):
            c1 = pltpu.make_async_copy(
                blb_hbm.at[bi, pl.ds(oy, win), pl.ds(ox, win)], blb_v,
                sem.at[0],
            )
            c2 = pltpu.make_async_copy(
                sob_hbm.at[bi, pl.ds(oy, win), pl.ds(ox, win)], sob_v,
                sem.at[1],
            )
            c1.start()
            c2.start()
            c1.wait()
            c2.wait()

            blb_raw = blb_v[:]  # int32 0/1
            sob = sob_v[:]

            # global (padded-map) linear index labels: consistent across
            # windows, so cores stitch without a merge pass
            gy = jax.lax.broadcasted_iota(jnp.int32, (win, win), 0) + oy
            gx = jax.lax.broadcasted_iota(jnp.int32, (win, win), 1) + ox
            idx = gy * padded_w + gx + 1
            # the image occupies padded rows [halo, halo+img_h)
            in_img = ((gy >= halo) & (gy < halo + img_h)
                      & (gx >= halo) & (gx < halo + img_w)).astype(jnp.int32)

            # NOTE: an empty-window early exit via lax.cond was measured
            # SLOWER on hardware (dense 96 vs 79 ms, empty 112 vs 74 ms
            # at 1148^2) — Mosaic pays for the branch rather than
            # skipping work; the fixpoints already converge in one
            # sweep on empty windows
            lab = _solve(blb_raw, sob, idx, in_img, gy, gx)
            out_ref[0] = lab[halo: halo + core, halo: halo + core]

        def _solve(blb_raw, sob, idx, in_img, gy, gx):
            blb_lab = _ccl_fixpoint(blb_raw, idx, win)
            blb_lab = _remove_small(blb_lab, blob_min_size)
            blb = (blb_lab > 0).astype(jnp.int32)
            blb_f = blb.astype(jnp.float32)

            overall = jnp.maximum(sob - (1.0 - blb_f), 0.0)
            dist = (1.0 - overall) * blb_f
            # reflect-101 the 1-px ring beyond the IMAGE border so the
            # 3x3 blur matches cv2/the XLA path there (window edges are
            # >= halo px from any core pixel, zero fill is fine)
            dist = jnp.where(gy == halo - 1, _shift(dist, -2, 0, 0.0), dist)
            dist = jnp.where(gy == halo + img_h, _shift(dist, 2, 0, 0.0), dist)
            dist = jnp.where(gx == halo - 1, _shift(dist, -2, 1, 0.0), dist)
            dist = jnp.where(gx == halo + img_w, _shift(dist, 2, 1, 0.0), dist)
            # 3x3 [1,2,1]/4 Gaussian via shifts
            k = jnp.float32(0.25)
            row = (_shift(dist, 1, 0, 0.0) + _shift(dist, -1, 0, 0.0)
                   + 2.0 * dist) * k
            dist = (_shift(row, 1, 1, 0.0) + _shift(row, -1, 1, 0.0)
                    + 2.0 * row) * k
            dist = -dist
            # fixed-range quantisation: dist in [-1, 0] by construction
            energy_q = jnp.round((dist + 1.0) * (num_levels - 1)).astype(
                jnp.int32
            )

            marker = blb * (1 - (overall >= 0.4).astype(jnp.int32))
            marker = _fill_holes(marker, win)
            # cv2.erode border: outside-of-IMAGE counts as foreground
            er = (_selem_count(marker | (1 - in_img), selem, fill=1)
                  >= selem_total).astype(jnp.int32) * in_img
            marker = (_selem_count(er, selem, fill=0) > 0).astype(
                jnp.int32) * in_img
            mk_lab = _ccl_fixpoint(marker, idx, win)
            mk_lab = _remove_small(mk_lab, marker_min_size)

            return _watershed(energy_q, mk_lab, blb, win)

        pl.run_scoped(
            run,
            blb_v=pltpu.VMEM((win, win), jnp.int32),
            sob_v=pltpu.VMEM((win, win), jnp.float32),
            sem=pltpu.SemaphoreType.DMA((2,)),
        )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("num_levels", "marker_min_size", "blob_min_size",
                     "core", "halo", "interpret"),
)
def proc_tail_blocked(blb_raw, sob, num_levels: int = NUM_LEVELS,
                      marker_min_size: int = 10, blob_min_size: int = 10,
                      core: int = CORE, halo: int = HALO,
                      interpret: bool = False):
    """Blocked-VMEM post-proc tail.

    blb_raw: [N,H,W] bool (thresholded + validity-masked NP map)
    sob:     [N,H,W] f32 max(inverted-normalised Sobel h, v)
    Returns [N,H,W] int32 labels: each instance's id is its watershed
    seed's UNPADDED-map linear index + 1 (in [1, H*W]) — window-stitch
    consistent AND binnable by compact_labels_u16.
    """
    n, h, w = blb_raw.shape
    win = core + 2 * halo
    nby = -(-h // core)
    nbx = -(-w // core)
    ph = nby * core + 2 * halo
    pw = nbx * core + 2 * halo

    def pad(x, fill):
        return jnp.pad(
            x, ((0, 0), (halo, ph - halo - h), (halo, pw - halo - w)),
            constant_values=fill,
        )

    blb_p = pad(blb_raw.astype(jnp.int32), 0)
    sob_p = pad(sob.astype(jnp.float32), 0.0)

    kernel = _make_kernel(pw, h, w, num_levels, marker_min_size,
                          blob_min_size, win, core, halo)
    out = pl.pallas_call(
        kernel,
        grid=(n, nby, nbx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, core, core), lambda i, j, k: (i, j, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, nby * core, nbx * core),
                                       jnp.int32),
        # the default scoped-vmem soft limit is 16M; v5e VMEM is far
        # larger and this kernel's live set peaks around ~90M of
        # 512^2 int32 temporaries
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(blb_p, sob_p)
    out = out[:, :h, :w]
    # localize: labels leave the kernel as PADDED-map linear seed
    # indices (windows stitch without a merge pass); rewrite each to the
    # seed's UNPADDED-map linear index + 1 so downstream per-map
    # compaction (compact_labels_u16) can bin in [0, h*w] — the seed
    # pixel is always in-image (markers are in_img-masked), so the
    # remap is a bijection and stitching consistency is preserved
    gy = (out - 1) // pw - halo
    gx = (out - 1) % pw - halo
    return jnp.where(out > 0, gy * w + gx + 1, 0)


def proc_np_hv_blocked(pred, valid_mask=None, num_levels: int = NUM_LEVELS,
                       marker_min_size: int = 10, blob_min_size: int = 10,
                       core: int = CORE, halo: int = HALO,
                       interpret: bool = False):
    """Full batched post-proc with the blocked-VMEM tail: XLA computes the
    (blob-independent) Sobel energy; the Pallas kernel does everything
    else. Same interface as post_proc_device.proc_np_hv_batch."""
    pred = pred.astype(jnp.float32)
    blb = pred[..., 0] >= 0.5
    if valid_mask is not None:
        blb = blb & valid_mask
    # min/max over the VALID region only — see post_proc_device
    # proc_np_hv_batch and filters.minmax_norm (canvas-wide stats over
    # a mirrored extension shift the normalisation the host oracle
    # computes on the source crop)
    h_dir = filters.minmax_norm(pred[..., 1], where=valid_mask)
    v_dir = filters.minmax_norm(pred[..., 2], where=valid_mask)
    sobelh = 1.0 - filters.minmax_norm(filters.sobel_h(h_dir, 21),
                                       where=valid_mask)
    sobelv = 1.0 - filters.minmax_norm(filters.sobel_v(v_dir, 21),
                                       where=valid_mask)
    sob = jnp.maximum(sobelh, sobelv)
    return proc_tail_blocked(
        blb, sob, num_levels=num_levels, marker_min_size=marker_min_size,
        blob_min_size=blob_min_size, core=core, halo=halo,
        interpret=interpret,
    )
