"""Pure grid math for tile and WSI inference.

All functions are deterministic NumPy index computations, golden-tested
against the behavioural contracts of the reference:

- tile patching: infer/tile.py:46-94 (_prepare_patching)
- patch top-left grids: infer/wsi.py:64-88
- post-proc tile/boundary/cross grids: infer/wsi.py:92-151
- chunk/patch alignment: infer/wsi.py:155-221

Design difference vs the reference: these return dense arrays consumed by
a *device-side* gather (patch extraction happens on-device from a padded
image already in HBM), instead of feeding per-patch Python slicing in
dataloader workers.
"""

from __future__ import annotations

import math

import numpy as np


def prepare_tile_patching(img_hw, window: int, step: int):
    """Compute reflect padding + patch grid so output windows tile the
    image exactly (infer/tile.py:46-94 semantics).

    Returns (pads (t, b, l, r), coords [K,2] top-left in padded image,
    grid (nr_rows, nr_cols)).
    """
    im_h, im_w = img_hw

    def last_steps(length):
        nr_step = math.ceil((length - step) / step)
        return int((nr_step + 1) * step), int(nr_step + 1)

    last_h, nr_rows = last_steps(im_h)
    last_w, nr_cols = last_steps(im_w)

    diff = window - step
    padt = padl = diff // 2
    padb = last_h + window - im_h
    padr = last_w + window - im_w

    ys = np.arange(0, last_h, step, dtype=np.int32)
    xs = np.arange(0, last_w, step, dtype=np.int32)
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    coords = np.stack([yy.ravel(), xx.ravel()], axis=-1)
    return (padt, padb, padl, padr), coords, (nr_rows, nr_cols)


def bucket_grid_dim(n: int) -> int:
    """Round a patch-grid dimension up to a canonical class: exact up to
    8, then geometric ~12.5% steps (next multiple of 2^(log2(n)-2)).
    Bounds the number of compiled tile programs for a directory of
    heterogeneous image sizes to O(log^2) classes at <= ~14% padded
    compute per dim (the reference instead re-batches by RAM budget,
    infer/tile.py:236-282)."""
    n = int(n)
    if n <= 8:
        return max(n, 1)
    q = 1 << (n.bit_length() - 3)
    return -(-n // q) * q


def patch_top_left_grid(img_shape, input_size, output_size):
    """Top-left coords of (input, output) windows covering img_shape
    (infer/wsi.py:64-88). All args are (y, x) int arrays."""
    img_shape = np.asarray(img_shape)
    input_size = np.asarray(input_size)
    output_size = np.asarray(output_size)
    diff = input_size - output_size
    nr_step = np.floor((img_shape - diff) / output_size) + 1
    last = (diff // 2) + nr_step * output_size
    ys = np.arange(diff[0] // 2, last[0], output_size[0], dtype=np.int32)
    xs = np.arange(diff[1] // 2, last[1], output_size[1], dtype=np.int32)
    # x-major ordering (matches the reference's meshgrid flatten)
    yy, xx = np.meshgrid(ys, xs, indexing="xy")
    out_tl = np.stack([yy.ravel(), xx.ravel()], axis=-1)
    in_tl = out_tl - diff // 2
    return in_tl, out_tl


def wsi_tile_grids(img_shape, tile_shape, ambiguous_size: int = 128):
    """3-phase post-processing grids: full tiles, boundary strips,
    4-corner crosses (infer/wsi.py:92-151).

    Returns three [K, 2, 2] arrays of (top-left, bottom-right) boxes.
    """
    img_shape = np.asarray(img_shape, np.int64)
    tile_shape = np.asarray(tile_shape, np.int64)

    tl, _ = patch_top_left_grid(img_shape, tile_shape, tile_shape)
    br = np.minimum(tl + tile_shape, img_shape)
    tile_grid = np.stack([tl, br], axis=1)

    ys = np.unique(tl[:, 0])
    xs = np.unique(tl[:, 1])

    def stack_boxes(tls, brs):
        return np.stack([tls, brs], axis=1)

    def mesh(a, b):
        aa, bb = np.meshgrid(a, b)
        return np.stack([aa.ravel(), bb.ravel()], axis=-1)

    # vertical strips around internal x boundaries, then horizontal
    bound_v = stack_boxes(
        mesh(ys, xs[1:] - ambiguous_size),
        mesh(ys + tile_shape[0], xs[1:] + ambiguous_size),
    )
    bound_h = stack_boxes(
        mesh(ys[1:] - ambiguous_size, xs),
        mesh(ys[1:] + ambiguous_size, xs + tile_shape[1]),
    )
    tile_boundary = np.concatenate([bound_v, bound_h], axis=0)

    cross = stack_boxes(
        mesh(ys[1:] - 2 * ambiguous_size, xs[1:] - 2 * ambiguous_size),
        mesh(ys[1:] + 2 * ambiguous_size, xs[1:] + 2 * ambiguous_size),
    )
    return tile_grid, tile_boundary, cross


def wsi_chunk_patch_grids(img_shape, chunk_input_shape, patch_input_shape,
                          patch_output_shape):
    """Chunk grid aligned so chunk outputs are exact multiples of patch
    outputs, plus the full patch grid (infer/wsi.py:155-221).

    Returns (chunk_info [C,2,2,2], patch_info [P,2,2,2]) where the axes
    are [idx, (input|output), (tl|br), (y|x)].
    """
    img_shape = np.asarray(img_shape, np.int64)
    chunk_input_shape = np.asarray(chunk_input_shape, np.int64)
    patch_input_shape = np.asarray(patch_input_shape, np.int64)
    patch_output_shape = np.asarray(patch_output_shape, np.int64)

    def round_down(x, mult):
        return (np.floor(x / mult) * mult).astype(np.int64)

    diff = patch_input_shape - patch_output_shape
    chunk_output_shape = round_down(chunk_input_shape - diff, patch_output_shape)
    chunk_input_shape = chunk_output_shape + diff

    p_in_tl, _ = patch_top_left_grid(img_shape, patch_input_shape, patch_output_shape)
    p_in_br = p_in_tl + patch_input_shape
    # true receptive centers (the reference stores input_tl + diff here,
    # infer/wsi.py:180 — a quirk only used for mask-overlap tests)
    p_out_tl = p_in_tl + diff // 2
    p_out_br = p_out_tl + patch_output_shape
    patch_info = np.stack(
        [np.stack([p_in_tl, p_in_br], axis=1), np.stack([p_out_tl, p_out_br], axis=1)],
        axis=1,
    )

    c_in_tl, _ = patch_top_left_grid(img_shape, chunk_input_shape, chunk_output_shape)
    c_in_br = c_in_tl + chunk_input_shape
    # clamp chunks that overrun the slide so their output stays a
    # multiple of the patch output (infer/wsi.py:194-210)
    for axis in range(2):
        sel = c_in_br[:, axis] > img_shape[axis]
        extent = (img_shape[axis] - diff[axis]) - c_in_tl[sel, axis]
        extent = round_down(extent, patch_output_shape[axis])
        c_in_br[sel, axis] = c_in_tl[sel, axis] + extent + diff[axis]
    c_out_tl = c_in_tl + diff // 2
    c_out_br = c_in_br - diff // 2
    chunk_info = np.stack(
        [np.stack([c_in_tl, c_in_br], axis=1), np.stack([c_out_tl, c_out_br], axis=1)],
        axis=1,
    )
    return chunk_info, patch_info


def select_patches_in_chunk(patch_info, chunk_info, patch_input_shape):
    """Patches whose input top-left lies within the chunk's feedable
    region (infer/wsi.py:341-349)."""
    start = chunk_info[0, 0]
    end = chunk_info[0, 1] - np.asarray(patch_input_shape)
    tl = patch_info[:, 0, 0]
    sel = (
        (tl[:, 0] >= start[0]) & (tl[:, 0] <= end[0])
        & (tl[:, 1] >= start[1]) & (tl[:, 1] <= end[1])
    )
    return patch_info[sel]
