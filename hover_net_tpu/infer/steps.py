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

import jax
import jax.numpy as jnp

from ..models.hovernet import HoVerNet


def _use_fused_enc(model: HoVerNet) -> bool:
    """Static gate for the Pallas fused-block encoder
    (models/encoder_pallas.py): HNT_FUSED_ENC=1 opt-in, TPU backend,
    fast mode, MXU-aligned widths, bf16 compute.

    OPT-IN, like the fused decoder: measured on v5e (w64, 49x256^2,
    K-delta) the fused d0 kernel runs 103.7 ms vs 39.0 ms for XLA's
    per-conv path — the whole-block VMEM fusion saves the HBM
    round-trips but loses 2.7x to per-grid-step overhead + narrow
    (64-wide) in-kernel matmuls at this geometry. Kept as the
    conv-fusion machinery (bit-exact tiling/masking semantics pinned
    by tests) and a future-tuning base, not as production default."""
    import os

    if not os.environ.get("HNT_FUSED_ENC"):
        return False
    cfg = model.cfg
    if cfg.mode != "fast" or (4 * cfg.width) % 128 or cfg.dtype != jnp.bfloat16:
        return False
    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform in ("tpu", "axon")


def infer_output(model: HoVerNet, variables, imgs, allow_fused_enc=True):
    """Forward + head activations -> [N, h, w, C] concat.

    On TPU (fast mode, MXU-aligned widths) the encoder runs as fused
    whole-residual-block Pallas kernels (models/encoder_pallas.py) —
    each block reads its input once and writes its output once instead
    of round-tripping the wide activations through HBM per unit.
    allow_fused_enc=False forces the standard XLA forward — required
    where GSPMD partitions the program over a mesh (it cannot
    partition Pallas custom calls; WSI's sharded forward passes False).

    HNT_FUSED_DEC=1 runs the decoder branches as one block-diagonal
    tower (models/fused_infer.py) — numerically equivalent (<=1e-6
    relative) but NOT the default: measured on v5e (w64 fast untyped,
    1000^2 tile, distinct weights) the fused tower is 167.7 ms vs
    159.6 ms per-branch — the decoders are HBM-bandwidth-bound, so
    doubling every activation's width doubles the bytes and the
    MXU-tile packing win never materialises. Kept as an opt-in
    experiment + the checkpoint-compatible fused-weight machinery."""
    import os

    if os.environ.get("HNT_FUSED_DEC"):
        from ..models.fused_infer import fused_decoders_apply

        feats = model.apply(variables, imgs, train=False,
                            return_feats=True)["feats"]
        out = fused_decoders_apply(model.cfg, variables, feats)
    elif allow_fused_enc and _use_fused_enc(model):
        from ..models.encoder_pallas import fused_forward

        out = fused_forward(model.cfg, variables, imgs)
    else:
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


def _tables_tail(full, inst_batch, typed: bool, nr_types):
    """Shared device tail: label compaction (uint16 crossings) +
    per-instance tables (stats + boundary COO — what the host pulls
    INSTEAD of the instance map, ~3-4x less D2H through the
    production path; the map itself is only pulled for mat export).

    The tables cross as exactly TWO fixed-capacity arrays (packed
    stats + COO), async-copied at dispatch: through a high-latency
    link, per-tile host->device round trips (dynamic slices, many
    small pulls) cost far more than the bytes they save."""
    from ..ops.post_proc_device import compact_labels_u16, instance_tables

    inst, n_labels = compact_labels_u16(inst_batch)
    tp_map = (full[..., 0].astype(jnp.uint8) if typed
              else jnp.zeros(full.shape[:2], jnp.uint8))
    h, w = inst.shape[1], inst.shape[2]
    t = instance_tables(
        inst[0].astype(jnp.int32), tp_map,
        coo_cap=min(1 << 16, h * w),
        nr_types=(nr_types if typed else None),
        # untyped: skip the device's only full-pixel scatter — the
        # host reconstructs exact sizes/centroids from boundary-run
        # pairing over the COO (post_proc_host.sums_from_runs)
        with_sums=typed,
    )
    parts = [t["bbox"]]
    if "sum_yx" in t:
        parts += [t["sum_yx"], t["size"][:, None]]
    if "type_hist" in t:
        parts.append(t["type_hist"])
    tables = {
        "stats": jnp.concatenate(parts, axis=-1),
        "coo": t["coo"],
        "coo_n": t["coo_n"],
    }
    return inst, n_labels, tp_map, tables


def _reflect_pp(full, src_hw_vec, typed: bool, exact: bool = False):
    """reflect-101 the source content over the canonical extension (so
    min-max normalisation sees exactly the source value range; exactly
    cv2's implicit Sobel border in the reference post-proc), build the
    validity mask confining instances to the source, and run the
    watershed tail. Idempotent in `full`: re-applying the mirror reads
    only source rows/cols, so an already-reflected map round-trips —
    the seam-guard refine path relies on this."""
    from ..ops.post_proc_device import proc_np_hv_batch

    sh, sw = src_hw_vec[0], src_hw_vec[1]
    rr = jnp.arange(full.shape[0])
    cc = jnp.arange(full.shape[1])
    ridx = jnp.where(rr < sh, rr, jnp.clip(2 * sh - 2 - rr, 0))
    cidx = jnp.where(cc < sw, cc, jnp.clip(2 * sw - 2 - cc, 0))
    full = full[ridx][:, cidx]
    valid = (rr < sh)[:, None] & (cc < sw)[None, :]
    seg = full[..., 1:4] if typed else full[..., 0:3]
    inst_b = proc_np_hv_batch(seg[None], valid[None], exact=exact)
    return full, inst_b


def make_pp_refine(model: HoVerNet):
    """Exact re-solve of an already-stitched canonical pred map — the
    seam-guard fallback (ops/post_proc_device.seam_suspects): when the
    blocked kernel's halo bound was violated (giant/degenerate
    instances), the tile's post-proc tail re-runs with the all-XLA
    scan path, skipping the forward. Same output contract as the
    make_tile_pipeline dynamic program."""
    typed = model.cfg.nr_types is not None

    @jax.jit
    def refine(full, src_hw_vec):
        full, inst_b = _reflect_pp(full, src_hw_vec, typed, exact=True)
        inst, n_labels, tp_map, tables = _tables_tail(
            full, inst_b, typed, model.cfg.nr_types)
        return full, inst[0], n_labels, tp_map, tables

    return refine


def make_tile_pipeline(model: HoVerNet, grid, src_hw=None, batch: int = 0):
    """ONE jit-compiled dispatch per tile: padded image -> (pred_map,
    inst_map, tp_map).

    Fusing gather+forward+stitch+post-proc into a single executable
    matters twice: XLA fuses across stage boundaries, and — measured on
    the tunneled bench chip — every separate dispatch costs ~100ms of
    launch latency, so a 5-dispatch pipeline is ~10x slower end-to-end
    than this single-call one.

    grid: (rows, cols) patch grid; batch>0 runs the forward in
    fixed-size sub-batches via lax.map to bound peak activation memory
    (0 = single batch).

    src_hw: the valid source size.
    - tuple: baked in as a compile-time constant; outputs are cropped to
      it inside the executable (one program per exact image size).
    - None: the returned fn takes a runtime `src_hw` [2] int32 instead —
      the stitched map is mirrored about the source edges
      (BORDER_REFLECT_101, exactly cv2's implicit Sobel border in the
      reference post-proc) before post-processing, the validity mask
      confines instances to the source, and outputs stay at canonical
      size (callers crop host-side). One compiled program then serves a
      whole canonical grid class of image sizes.
    """
    from ..ops.post_proc_device import proc_np_hv_batch

    win = model.cfg.patch_input_shape
    typed = model.cfg.nr_types is not None
    r, c = grid

    def forward_stitch(variables, padded_img, coords):
        patches = extract_patches(padded_img, coords, win)
        # `batch` is a soft activation-memory cap: a single batch beats
        # lax.map sub-batching by ~25ms/tile on TPU (measured, 49x256^2
        # w64), so only split when the grid is well past the cap
        if batch and 2 * batch < patches.shape[0]:
            k = patches.shape[0]
            # balance the sub-batches instead of padding to `batch`:
            # 80 patches at batch 32 would pad to 3x32 (20% wasted
            # forward compute); 3x27 keeps the memory bound and wastes
            # one patch slot
            nb = -(-k // batch)
            eff = -(-k // nb)
            pad_k = nb * eff - k
            p = jnp.concatenate(
                [patches, jnp.zeros((pad_k,) + patches.shape[1:], patches.dtype)]
            ).reshape(-1, eff, *patches.shape[1:])
            out = jax.lax.map(lambda x: infer_output(model, variables, x), p)
            out = out.reshape(-1, *out.shape[2:])[:k]
        else:
            out = infer_output(model, variables, patches)
        h, w, ch = out.shape[1], out.shape[2], out.shape[3]
        full = out.reshape(r, c, h, w, ch).transpose(0, 2, 1, 3, 4)
        return full.reshape(r * h, c * w, ch)

    def tail(full, inst_batch):
        return _tables_tail(full, inst_batch, typed, model.cfg.nr_types)

    if src_hw is not None:

        @jax.jit
        def run(variables, padded_img, coords):
            full = forward_stitch(variables, padded_img, coords)
            valid = jnp.zeros(full.shape[:2], bool) \
                .at[: src_hw[0], : src_hw[1]].set(True)
            seg = full[..., 1:4] if typed else full[..., 0:3]
            inst_b = proc_np_hv_batch(seg[None], valid[None])
            inst, n_labels, tp_map, tables = tail(full, inst_b)
            # crop to source inside the same executable: smaller
            # transfers, no extra slice dispatches on the host side
            sh, sw = src_hw
            return (full[:sh, :sw], inst[0, :sh, :sw], n_labels,
                    tp_map[:sh, :sw], tables)

        return run

    @jax.jit
    def run_dynamic(variables, padded_img, coords, src_hw_vec):
        full = forward_stitch(variables, padded_img, coords)
        full, inst_b = _reflect_pp(full, src_hw_vec, typed)
        inst, n_labels, tp_map, tables = tail(full, inst_b)
        return full, inst[0], n_labels, tp_map, tables

    run_dynamic.forward_stitch = forward_stitch  # probe hook (bench.py)
    return run_dynamic


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
