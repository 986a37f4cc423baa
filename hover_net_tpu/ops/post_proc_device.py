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
- **watershed**: parallel watershed by topographic distance, solved in
  two phases. Phase 1 relaxes the lexicographic cost (max energy along
  the path, hops since the last strict ascent) to its EXACT fixpoint —
  the ascent-reset makes the cost isotone, so distributed relaxation
  and a sequential Dijkstra agree, and hops-since-ascent reproduces
  priority-flood's plateau splitting (geodesic distance from the
  flood's entry into the plateau). Phase 2 resolves exact primary-cost
  ties by minimising (total hops from the marker, marker label) along
  cost-attaining edges to ITS fixpoint — a canonical, history-free tie
  resolution identical across this scan path, the blocked Pallas
  kernel, and a sequential solve. Differences
  vs skimage's sequential flood are confined to equal-cost tie pixels
  (instance-level AJI ~0.985 boundary wobble, no instance flips;
  validated against the reference pipeline in
  tests/test_ref_e2e_parity.py).

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
# 65536 levels (fine enough that quantisation plateaus shrink to float
# noise — coarse plateaus put boundary placement at the mercy of tie
# heuristics) x 15 hop bits keeps the word positive in int32, and
# lexicographic (level, hops) order == integer order on the word. Hops
# reset on every strict ascent, so they are bounded by plateau/descent
# run lengths; crossings saturate at HOP_MASK as a degenerate-flats
# guard (ties beyond 32767 hops instead of level corruption).
HOP_BITS = 15
HOP_MASK = (1 << HOP_BITS) - 1
NUM_LEVELS = 1 << 16


def cross_cost(q_c, energy_sh):
    """Packed cost after crossing one pixel of shifted energy
    `energy_sh` from a neighbour with packed cost `q_c`: a strict ascent
    resets the hop count, otherwise hops+1 (saturating — INT_MAX passes
    through unchanged since its hop bits are already all-ones)."""
    lev = q_c & ~HOP_MASK
    bump = ((q_c & HOP_MASK) != HOP_MASK).astype(jnp.int32)
    return jnp.where(energy_sh > lev, energy_sh, q_c + bump)


def _ws_scan(cost, lab, energy_sh, mask, axis: int, reverse: bool):
    """One directional relaxation scan of packed watershed costs.

    Crossing rule (per element with shifted energy E): an incoming cost
    (L, d) becomes (E, 0) if E > L — the hop count RESETS on a strict
    ascent — else (L, d + 1). The reset makes the lexicographic cost
    isotone (the no-reset variant violates the optimal-substructure
    property: a higher-level lower-hop prefix can win after an ascent,
    so distributed relaxation converges to a different fixpoint than the
    label-setting solve), and it reproduces priority-flood's plateau
    splitting: hops-since-last-ascent IS the geodesic distance from the
    flood's entry point into the current plateau.

    Summary of a segment: (barrier, max shifted energy M, length n,
    tail t = elements after the FIRST attainment of M — where the last
    reset of any crossing with incoming level < M happens — and the best
    exiting (cost, label), the min over seeded start points inside the
    segment of their cost propagated to the trailing edge). Associative:
    composing a|b takes t = t_b if M_b > M_a else t_a + n_b.
    """
    barrier = ~mask
    seeded = lab > 0
    ok = seeded & ~barrier
    elems = (
        barrier,
        energy_sh,
        jnp.ones_like(energy_sh),
        jnp.zeros_like(energy_sh),
        jnp.where(ok, cost, INT_MAX),
        jnp.where(ok, lab, 0),
    )

    def op(a, b):
        fa, Ma, na, ta, ca, la = a
        fb, Mb, nb, tb, cb, lb = b
        can = ~fb & (ca != INT_MAX)
        lev_a = ca & ~HOP_MASK
        cand = jnp.where(
            lev_a >= Mb,
            lev_a | jnp.minimum((ca & HOP_MASK) + nb, HOP_MASK),
            Mb | jnp.minimum(tb, HOP_MASK),
        )
        cand = jnp.where(can, cand, INT_MAX)
        cl = jnp.where(can, la, 0)
        take = (cand < cb) | ((cand == cb) & can & (cl < lb))
        return (
            fa | fb,
            jnp.maximum(Ma, Mb),
            na + nb,
            jnp.where(Mb > Ma, tb, ta + nb),
            jnp.where(take, cand, cb),
            jnp.where(take, cl, lb),
        )

    _, _, _, _, b_cost, b_lab = jax.lax.associative_scan(
        op, elems, axis=axis, reverse=reverse
    )
    has = b_lab > 0
    better = has & ((b_cost < cost) | ((b_cost == cost) & (b_lab < lab)))
    return (jnp.where(better, b_cost, cost),
            jnp.where(better, b_lab, lab))


def watershed_flood(energy_q, markers, mask, num_levels: int = NUM_LEVELS):
    """Marker-based watershed by minimax (topographic) path cost.

    Alternating directional relaxation scans until fixpoint; the hop
    count packed into the low cost bits reproduces priority-flood's BFS
    plateau splitting, the final label comparison makes ties fully
    deterministic.

    energy_q: [N,H,W] int32 quantised energy (0..num_levels-1)
    markers:  [N,H,W] int32 labels (0 = unlabeled)
    mask:     [N,H,W] bool flood region
    """
    assert num_levels <= NUM_LEVELS
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

    # Phase 2: tie resolution. The scan op is associative in the COST
    # component but NOT in a label tie-break (a segment-composed offer
    # can thread a label over intermediate pixels whose own optimal
    # cost is lower than the carried prefix), so labels are assigned in
    # a separate exact relaxation restricted to the optimal-edge DAG
    # the fixed costs define. Among primary-cost-optimal paths we
    # minimise (total hops from the marker, then marker label) — total
    # hops is trivially isotone on the fixed DAG, so 4-neighbour
    # relaxation converges to the unique least fixpoint: a canonical,
    # history-free result shared by the Pallas sweep kernels and any
    # sequential solve, and the closest cheap analog of
    # priority-flood's arrival-order split on exact-tie plateaus
    # (geodesic distance from the marker).
    sec0 = jnp.where(seeded, 0, INT_MAX)

    def relabel(state):
        sec_c, lab_c, _ = state
        new_s, new_l = sec_c, lab_c
        for axis, sh in ((2, 1), (2, -1), (1, 1), (1, -1)):
            c_n = _shift(cost, axis, sh, INT_MAX)
            s_n = _shift(new_s, axis, sh, INT_MAX)
            l_n = _shift(new_l, axis, sh, 0)
            cand = cross_cost(c_n, energy_sh)
            offer = ((c_n != INT_MAX) & (s_n != INT_MAX) & (l_n > 0)
                     & mask & (cand == cost))
            s_c = jnp.where(offer, s_n + 1, INT_MAX)
            take = offer & ((s_c < new_s) | ((s_c == new_s) & (l_n < new_l)))
            new_s = jnp.where(take, s_c, new_s)
            new_l = jnp.where(take, l_n, new_l)
        return new_s, new_l, jnp.any(new_l != lab_c) | jnp.any(new_s != sec_c)

    _, lab, _ = jax.lax.while_loop(
        lambda s: s[2], relabel, (sec0, lab0, jnp.bool_(True))
    )
    return jnp.where(mask, lab, 0)


def _shift(arr, axis: int, amt: int, fill):
    """Shift [N,H,W] content by `amt` along axis, filling vacated cells."""
    rolled = jnp.roll(arr, amt, axis=axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, arr.shape, axis)
    n = arr.shape[axis]
    valid = idx >= amt if amt > 0 else idx < n + amt
    return jnp.where(valid, rolled, fill)


def blocked_geom(h: int, w: int):
    """(core, halo) the blocked-VMEM kernel uses for an (h, w) map.

    halo == 0 means the whole map fits one VMEM window and the blocked
    solve is EXACT (no seams); the (8,128)-aligned core bounds the
    padding waste. Larger maps use 384/64 (fused-program scan-delta
    optimum on v5e, round 4: 261.8 vs 272.1 ms/tile at 256/128 — 9
    windows instead of 25 at 1148^2, 1.78x instead of 4x halo
    overcompute) or the HNT_PP_GEOM=core,halo override. The 64-px halo
    still bounds every legit nucleus at 40x; larger components trip the
    seam guard and re-solve exactly (seam_suspects)."""
    if max(h, w) <= 512:
        return max(-(-max(h, w) // 128) * 128, 128), 0
    import os

    geom = os.environ.get("HNT_PP_GEOM")
    if geom:
        core, halo = (int(v) for v in geom.split(","))
        return core, halo
    return 384, 64


def active_blocked_geom(h: int, w: int):
    """(core, halo) when proc_np_hv_batch would take the seamed blocked
    path for an (h, w) map — else None (exact solve, no guard needed)."""
    if _post_proc_mode(h, w) != "fulltail":
        return None
    core, halo = blocked_geom(h, w)
    return (core, halo) if halo > 0 else None


def seam_suspects(bbox, h: int, w: int, geom=None):
    """Conservative runtime detector for the blocked kernel's halo
    bound (post_proc_pallas.py:26-30): a component whose extent exceeds
    the halo may resolve differently across block seams — a giant blob
    from a degenerate prediction silently FRAGMENTS instead of
    erroring. A seam cut leaves fragments whose bboxes END exactly on
    a core gridline, and the window that could see the far side of the
    cut keeps a piece spanning more than `halo` past the seam (that is
    what made the other window blind). So: flag every output instance
    with extent > halo whose bbox touches or straddles a core
    gridline. Legit nuclei at 40x are well under a 64-px halo, so in
    practice this only fires on contract violations (and at worst
    re-solves a window holding a genuinely giant instance exactly).

    bbox: [N, 4] (rmin, rmax_excl, cmin, cmax_excl) host array in the
    post-proc map's coordinates; (h, w): the map shape the solve ran
    on; geom: (core, halo) override for tests — defaults to the live
    active_blocked_geom (all-False when the exact path ran).

    Returns [N] bool. Callers re-solve flagged windows with
    proc_np_hv_batch(..., exact=True) and log a warning."""
    bbox = np.asarray(bbox)
    n = bbox.shape[0]
    if geom is None:
        geom = active_blocked_geom(h, w)
    if geom is None or n == 0:
        return np.zeros((n,), bool)
    core, halo = geom
    rmin, rmax = bbox[:, 0], bbox[:, 1]
    cmin, cmax = bbox[:, 2], bbox[:, 3]
    nonempty = (rmax > rmin) & (cmax > cmin)
    tall = (rmax - rmin) > halo
    wide = (cmax - cmin) > halo
    # bbox touches a block gridline at k*core (a cut fragment's edge
    # lies ON the seam) or straddles one (inclusive last index)
    r_seam = ((rmin % core == 0) | (rmax % core == 0)
              | ((rmin // core) != ((rmax - 1) // core)))
    c_seam = ((cmin % core == 0) | (cmax % core == 0)
              | ((cmin // core) != ((cmax - 1) // core)))
    return nonempty & ((tall & r_seam) | (wide & c_seam))


@functools.partial(jax.jit, static_argnames=(
    "num_levels", "marker_min_size", "blob_min_size", "exact"))
def proc_np_hv_batch(pred, valid_mask=None, num_levels: int = NUM_LEVELS,
                     marker_min_size: int = 10, blob_min_size: int = 10,
                     exact: bool = False):
    """Batched __proc_np_hv (post_proc.py:26-90): [N,H,W,3] -> [N,H,W] int32.

    Channels: 0 nuclei prob, 1 horizontal, 2 vertical.

    valid_mask ([N,H,W] bool, optional): restricts nuclei to the source
    image region when `pred` carries reflect-padding beyond it (the
    padded area still feeds the Sobel window like cv2's reflected
    border, but can't spawn instances).

    exact=True forces the all-XLA scan formulation even on TPU — the
    seam-guard fallback for maps where the blocked kernel's halo bound
    was violated (see seam_suspects).
    """
    h, w = pred.shape[1], pred.shape[2]
    if not exact and _post_proc_mode(h, w) == "fulltail":
        from .post_proc_pallas import proc_np_hv_blocked

        core, halo = blocked_geom(h, w)
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

    # all four normalisations take their min/max over the VALID region
    # only (the host oracle normalises over exactly the source crop;
    # canvas-wide stats over the mirrored extension see sign-flipped
    # Sobel values the source never produced — filters.minmax_norm)
    h_dir = filters.minmax_norm(pred[..., 1], where=valid_mask)
    v_dir = filters.minmax_norm(pred[..., 2], where=valid_mask)
    sobelh = 1.0 - filters.minmax_norm(filters.sobel_h(h_dir, 21),
                                       where=valid_mask)
    sobelv = 1.0 - filters.minmax_norm(filters.sobel_v(v_dir, 21),
                                       where=valid_mask)

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

    # quantise energy over the FIXED [-1, 0] range dist lies in by
    # construction (overall, blb in [0,1]) — the same rule as the
    # blocked Pallas kernel, so both device paths see identical
    # plateaus and produce identical labels
    energy_q = jnp.round((dist + 1.0) * (num_levels - 1)).astype(jnp.int32)

    return watershed_flood(energy_q, marker_lab, blb, num_levels)


def compact_labels_u16(inst):
    """Per-window compaction of positive labels to dense ids so
    instance maps cross to the host as uint16 (quarter the D2H volume
    of int32). Labels must be SEED-INDEX labels: id = the component's
    seed pixel's window-linear index + 1, with the seed pixel itself
    carrying its own id (what connected_components and both watershed
    paths produce — CCL seeds at the component's min pixel, watershed
    markers keep their seed label).

    The seed-index property makes presence ELEMENTWISE
    (lab[i] == i + 1 exactly at seed pixels), so the rank (number of
    present labels <= own label) is one prefix sum + one gather — no
    scatter. A scatter formulation costs ~25ms/1.3M px on TPU (XLA
    lowers scatter to a sort), the gather one ~5ms, an argsort ~50ms.

    inst: [B, H, W] int32 -> ([B, H, W] uint16 (0 stays background),
    [B] int32 distinct-label count — callers warn if it ever exceeds
    65535, where the clip would alias ids)."""
    n, h, w = inst.shape
    iota1 = jnp.arange(1, h * w + 1, dtype=jnp.int32)

    def compact(lab):
        flat = lab.ravel()
        present = (flat == iota1).astype(jnp.int32)
        ranks = jnp.cumsum(present)
        # rank of label L = ranks[L - 1]; background (0) -> rank 0
        out = jnp.where(flat > 0, ranks[jnp.maximum(flat - 1, 0)], 0)
        return out.reshape(lab.shape), ranks[-1]

    out, n_labels = jax.vmap(compact)(inst)
    return jnp.clip(out, 0, 65535).astype(jnp.uint16), n_labels


# 8-neighbour direction table (E, NE, N, NW, W, SW, S, SE) — the bit
# order the native COO contour tracer expects
# (native/instance_table.cpp trace_contours_coo)
_DIRS8 = ((0, 1), (-1, 1), (-1, 0), (-1, -1),
          (0, -1), (1, -1), (1, 0), (1, 1))


def _shift2d(x, dy: int, dx: int, fill):
    """y[r, c] = x[r + dy, c + dx] (out-of-range -> fill)."""
    h, w = x.shape
    out = jnp.roll(x, (-dy, -dx), axis=(0, 1))
    rr = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    ok = ((rr + dy >= 0) & (rr + dy < h) & (cc + dx >= 0) & (cc + dx < w))
    return jnp.where(ok, out, fill)


def instance_tables(lab, tp_map=None, coo_cap: int = 1 << 17,
                    stat_cap: int = 4096, nr_types=None,
                    with_sums: bool = True):
    """Fixed-capacity per-instance tables from a COMPACTED label map —
    what the host pulls instead of the full instance map (~10-30x less
    D2H): per-instance stats plus the boundary-pixel COO the native
    Suzuki-Abe tracer walks (ops/instance_table.trace_contours_coo).

    lab: [H, W] int32 with contiguous labels 0..n (n <= 65535, i.e.
    compact_labels_u16 output); tp_map: [H, W] uint8/int type map.

    with_sums=False drops the size/sum_yx tables: the only full-pixel
    scatter in the tail (XLA lowers an H*W-update scatter to a sort,
    ~20ms at 1148^2 — everything else here touches <= coo_cap
    elements). The host reconstructs exact sizes/centroids from the
    COO instead: horizontal run starts/ends are always boundary pixels
    (a run's first/last pixel has a differing W/E neighbour), so
    pairing them per (label, row) recovers every interior run
    (ops/post_proc_host.sums_from_runs). Typed configs keep the
    scatter — the per-pixel type histogram has no boundary-only
    formulation.

    Returns dict:
      coo    [coo_cap, 2] int32 ((y<<16)|x, (label<<8)|mask8), raster
             (y, x) order with labels interleaved (the native tracer
             counting-sorts by label); slack rows ((2^31-1), 0)
      coo_n  [] int32 true boundary-pixel count (host falls back to a
             full-map pull when it exceeds coo_cap)
      bbox   [stat_cap+1, 4] int32 (rmin, rmax_excl, cmin, cmax_excl)
      sum_yx [stat_cap+1, 2] int32 (exact for instances < ~1e6 px;
             a degenerate giant blob overflows — host falls back)
             [with_sums only]
      size   [stat_cap+1] int32                      [with_sums only]
      type_hist [stat_cap+1, nr_types] int32 (typed only)
    Row index = label; labels > stat_cap land in the dustbin row
    stat_cap (host falls back when n_labels > stat_cap).
    """
    if nr_types:
        with_sums = True  # type_hist needs the full-pixel scatter anyway
    lab = lab.astype(jnp.int32)
    h, w = lab.shape
    same = jnp.zeros((h, w), jnp.int32)
    for k, (dy, dx) in enumerate(_DIRS8):
        nb = _shift2d(lab, dy, dx, 0)
        same = same | (((nb == lab) & (lab > 0)).astype(jnp.int32) << k)
    boundary = (lab > 0) & (same != 0xFF)

    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    # compact boundary pixels in RASTER order by INVERTING the prefix
    # sum with a binary search: position of the i-th boundary pixel =
    # searchsorted(cumsum(boundary), i+1). All-gather formulation —
    # XLA lowers a full-map scatter to a ~25ms sort per 1.3M px on
    # TPU, the 21-step binary search over coo_cap queries costs ~2ms.
    # The native tracer restores the (label, y, x) grouping with an
    # O(n) counting sort (raster order within each label preserved).
    flatb = boundary.ravel().astype(jnp.int32)
    cum = jnp.cumsum(flatb)
    coo_n = cum[-1]
    pos = jnp.searchsorted(
        cum, jnp.arange(1, coo_cap + 1, dtype=jnp.int32), side="left"
    )
    hit = jnp.arange(coo_cap, dtype=jnp.int32) < jnp.minimum(coo_n, coo_cap)
    pos = jnp.minimum(pos, h * w - 1)
    pyx = ((yy << 16) | xx).ravel()
    plm = ((lab << 8) | same).ravel()
    coo = jnp.stack(
        [
            jnp.where(hit, pyx[pos], INT_MAX),
            jnp.where(hit, plm[pos], 0),
        ],
        axis=-1,
    )

    # size / coordinate sums / type histogram: ONE merged scatter-add
    # (payload [1, y, x, onehot(type)...]) — scatter cost on TPU scales
    # with the update count (sort-based lowering), not the payload
    # width, so 1 pass beats the naive 3 + nr_types passes ~5x
    sums = None
    if with_sums:
        flat = jnp.minimum(lab.ravel(), stat_cap)
        ys, xs = yy.ravel(), xx.ravel()
        cols = [jnp.ones_like(flat), ys, xs]
        if nr_types:
            t = jnp.clip(tp_map.astype(jnp.int32).ravel(), 0, nr_types - 1)
            cols += [(t == k).astype(jnp.int32) for k in range(nr_types)]
        payload = jnp.stack(cols, axis=-1)
        sums = jnp.zeros((stat_cap + 1, payload.shape[1]), jnp.int32) \
            .at[flat].add(payload)

    # bbox: an instance's row/col extremes always lie on its boundary
    # (an extreme pixel has an outside neighbour), so min/max over the
    # compacted COO entries (<= coo_cap updates) suffices — when the
    # table overflows (coo_n > coo_cap) the host falls back to the
    # dense-map path anyway
    bl = jnp.where(hit, coo[:, 1] >> 8, stat_cap)
    bl = jnp.minimum(bl, stat_cap)
    by = jnp.where(hit, coo[:, 0] >> 16, 0)
    bx = jnp.where(hit, coo[:, 0] & 0xFFFF, 0)
    mins = jnp.full((stat_cap + 1, 2), jnp.iinfo(jnp.int32).max, jnp.int32) \
        .at[bl].min(jnp.stack([by, bx], axis=-1))
    maxs = jnp.zeros((stat_cap + 1, 2), jnp.int32) \
        .at[bl].max(jnp.stack([by + 1, bx + 1], axis=-1))
    # presence: every non-empty instance has boundary pixels, so the
    # COO min is INT_MAX exactly on empty rows (== size 0)
    present = (sums[:, 0] > 0) if with_sums \
        else (mins[:, 0] != jnp.iinfo(jnp.int32).max)
    rmin = jnp.where(present, mins[:, 0], h)
    cmin = jnp.where(present, mins[:, 1], w)

    out = {
        "coo": coo,
        "coo_n": coo_n,
        "bbox": jnp.stack([rmin, maxs[:, 0], cmin, maxs[:, 1]], axis=-1),
    }
    if with_sums:
        out["sum_yx"] = sums[:, 1:3]
        out["size"] = sums[:, 0]
    if nr_types:
        out["type_hist"] = sums[:, 3:]
    return out


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
