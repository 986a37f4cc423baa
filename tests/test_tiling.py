"""Grid math vs golden values extracted from the reference implementation.

Golden constants were produced by executing the reference's grid
functions (infer/wsi.py:64-221, infer/tile.py:46-94) on fixed inputs.

Known deviation (intentional): our patch *output* boxes are the true
receptive centers (input_tl + diff//2) whereas the reference stores
input_tl + diff (infer/wsi.py:180) — it only uses those boxes for
tissue-mask overlap tests, where the 95px shift is a quirk, not a
contract. Input boxes and chunk/tile grids are bit-identical.
"""

import numpy as np

from hover_net_tpu.data.tiling import (
    patch_top_left_grid,
    prepare_tile_patching,
    select_patches_in_chunk,
    wsi_chunk_patch_grids,
    wsi_tile_grids,
)

IMG = np.array([5000, 4200])


def test_prepare_tile_patching_1000px_original():
    pads, coords, grid = prepare_tile_patching((1000, 1000), 270, 80)
    assert pads == (95, 310, 95, 310)
    assert grid == (13, 13)
    assert coords.shape == (169, 2)
    assert coords[0].tolist() == [0, 0]
    assert coords[-1].tolist() == [960, 960]


def test_patch_top_left_grid_golden():
    itl, otl = patch_top_left_grid(IMG, np.array([256, 256]), np.array([164, 164]))
    assert itl.shape == (780, 2)
    assert itl.sum() == 3453840
    assert otl.sum() == 3525600
    assert itl[0].tolist() == [0, 0]
    assert itl[-1].tolist() == [4756, 4100]


def test_wsi_tile_grids_golden():
    tg, tb, tc = wsi_tile_grids(IMG, np.array([2048, 2048]), 128)
    assert tg.shape == (9, 2, 2) and tg.sum() == 101328
    assert tg[0].tolist() == [[0, 0], [2048, 2048]]
    assert tg[-1].tolist() == [[4096, 4096], [5000, 4200]]
    assert tb.shape == (12, 2, 2) and tb.sum() == 147456
    assert tb[0].tolist() == [[0, 1920], [2048, 2176]]
    assert tb[-1].tolist() == [[3968, 4096], [4224, 6144]]
    assert tc.shape == (4, 2, 2) and tc.sum() == 49152
    assert tc[0].tolist() == [[1792, 1792], [2304, 2304]]


def test_wsi_chunk_patch_grids_golden():
    ci, pi = wsi_chunk_patch_grids(
        IMG, np.array([2048, 2048]), np.array([270, 270]), np.array([80, 80])
    )
    assert ci.shape == (9, 2, 2, 2) and ci.sum() == 192120
    assert ci[0].tolist() == [[[0, 0], [2030, 2030]], [[95, 95], [1935, 1935]]]
    assert ci[-1].tolist() == [[[3680, 3680], [4990, 4190]], [[3775, 3775], [4895, 4095]]]
    assert pi.shape == (3111, 2, 2, 2)
    # input boxes identical to reference; output boxes are centered
    # (reference sum 59295660 with its +diff/2 offset quirk on 4 coords)
    assert pi.sum() == 59295660 - 3111 * 4 * 95
    assert pi[0, 0].tolist() == [[0, 0], [270, 270]]
    assert pi[-1, 0].tolist() == [[4800, 4000], [5070, 4270]]
    assert pi[0, 1].tolist() == [[95, 95], [175, 175]]


def test_chunk_outputs_are_patch_multiples():
    ci, _ = wsi_chunk_patch_grids(
        IMG, np.array([2048, 2048]), np.array([270, 270]), np.array([80, 80])
    )
    out_extent = ci[:, 1, 1] - ci[:, 1, 0]
    assert np.all(out_extent % 80 == 0)


def test_select_patches_in_chunk():
    ci, pi = wsi_chunk_patch_grids(
        IMG, np.array([2048, 2048]), np.array([270, 270]), np.array([80, 80])
    )
    total = 0
    seen = set()
    for c in ci:
        sub = select_patches_in_chunk(pi, c, (270, 270))
        total += len(sub)
        for tl in sub[:, 1, 0]:
            seen.add(tuple(tl.tolist()))
    # each selected patch lands in exactly one chunk; the final partial
    # patch row/column (input box overrunning the slide) is never
    # selected — reference behaviour (its pred_map strip beyond the last
    # aligned chunk output stays uninitialised)
    assert total == 3000
    assert len(seen) == 3000
