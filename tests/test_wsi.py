"""WSI pipeline tests: handler mag logic, 3-phase boundary-consistent
stitching on synthetic data, and a full plumbing run on a pseudo-slide.
"""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from hover_net_tpu.infer.wsi_handler import ArrayHandler, get_file_handler
from hover_net_tpu.data.tiling import wsi_tile_grids
from hover_net_tpu.ops.targets import gen_instance_hv_map
from hover_net_tpu.metrics import get_fast_aji, remap_label


def _paint_nuclei(shape, rng, n, r_range=(6, 11)):
    inst = np.zeros(shape, np.int32)
    yy, xx = np.mgrid[-12:13, -12:13]
    k = 1
    for _ in range(n):
        cy = rng.integers(14, shape[0] - 14)
        cx = rng.integers(14, shape[1] - 14)
        r = rng.integers(*r_range)
        m = (yy**2 + xx**2) <= r * r
        sub = inst[cy - 12 : cy + 13, cx - 12 : cx + 13]
        sub[m & (sub == 0)] = k
        k += 1
    return inst


def test_array_handler_mag_logic(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (400, 300, 3), dtype=np.uint8)
    p = str(tmp_path / "slide.npy")
    np.save(p, arr)
    h = get_file_handler(p, base_mag=40.0)
    assert isinstance(h, ArrayHandler)
    dims = h.get_dimensions(40.0)
    assert dims.tolist() == [300, 400]  # (x, y)
    dims20 = h.get_dimensions(20.0)
    assert dims20.tolist() == [150, 200]
    # native read
    h.prepare_reading(read_mag=40.0, cache_path=str(tmp_path / "c.npy"))
    region = h.read_region((10, 20), (50, 60))  # (x, y), (w, h)
    np.testing.assert_array_equal(region, arr[20:80, 10:60])
    # non-native read -> cached rescale
    h2 = get_file_handler(p, base_mag=40.0)
    h2.prepare_reading(read_mag=20.0, cache_path=str(tmp_path / "c2.npy"))
    region = h2.read_region((0, 0), (50, 50))
    assert region.shape == (50, 50, 3)


@pytest.mark.slow
def test_three_phase_stitching_no_duplicates(tmp_path):
    """Nuclei straddling post-proc tile boundaries are recovered exactly
    once by the phase-2/3 fixing passes."""
    from hover_net_tpu.infer.wsi import WSIInferManager

    rng = np.random.default_rng(1)
    shape = (700, 600)
    inst_gt = _paint_nuclei(shape, rng, 120)
    hv = gen_instance_hv_map(inst_gt, shape)
    pred = np.dstack([(inst_gt > 0).astype(np.float32),
                      hv[..., 0], hv[..., 1]]).astype(np.float32)

    mgr = WSIInferManager.__new__(WSIInferManager)  # bypass model load
    mgr.nr_types = None
    mgr.tile_shape = 256
    mgr.ambiguous_size = 32
    mgr.wsi_proc_shape = np.array(shape)
    mgr.wsi_mask = np.ones((70, 60), np.uint8)
    mgr.wsi_inst_info = {}
    mgr._pred_map_path = str(tmp_path / "pred_map.npy")
    np.save(mgr._pred_map_path, pred)
    mgr.wsi_inst_map = np.zeros(shape, np.int32)

    tg, tb, tc = wsi_tile_grids(np.array(shape), np.array([256, 256]), 32)
    mgr._dispatch_post_processing(tg, mgr._cb_normal_tile, "phase1")
    mgr._dispatch_post_processing(tb, mgr._cb_fixing_tile, "phase2")
    mgr._dispatch_post_processing(tc, mgr._cb_fixing_tile, "phase3")

    # the right invariant: tiling + 3-phase fixing must reproduce the
    # single-shot post-proc of the whole map (which itself may merge a
    # few touching synthetic nuclei — that's watershed behaviour, not a
    # stitching defect)
    from hover_net_tpu.ops.post_proc_device import proc_np_hv_batch

    whole = remap_label(np.asarray(proc_np_hv_batch(jnp.asarray(pred[None])))[0])
    got = remap_label(mgr.wsi_inst_map)
    assert abs(int(got.max()) - int(whole.max())) <= 2, (got.max(), whole.max())
    aji = get_fast_aji(whole, got)
    assert aji > 0.95, aji
    # info dict consistent with the final map
    map_ids = set(np.unique(mgr.wsi_inst_map).tolist()) - {0}
    assert map_ids == set(mgr.wsi_inst_info.keys())


def test_dispatch_skips_degenerate_boxes(tmp_path):
    """A slide whose size is an exact tile multiple makes the reference's
    floor+1 grid math (infer/wsi.py:74) emit a trailing row/column of
    zero-area boxes; _dispatch_post_processing must skip them instead of
    feeding zero-size windows to the post-proc kernels (regression:
    ValueError zero-size reduction in minmax_norm)."""
    from hover_net_tpu.infer.wsi import WSIInferManager

    rng = np.random.default_rng(5)
    shape = (512, 512)  # exact multiple of the 256 tile
    inst_gt = _paint_nuclei(shape, rng, 60)
    hv = gen_instance_hv_map(inst_gt, shape)
    pred = np.dstack([(inst_gt > 0).astype(np.float32),
                      hv[..., 0], hv[..., 1]]).astype(np.float32)

    mgr = WSIInferManager.__new__(WSIInferManager)
    mgr.nr_types = None
    mgr.tile_shape = 256
    mgr.ambiguous_size = 32
    mgr.wsi_proc_shape = np.array(shape)
    mgr.wsi_mask = np.ones((64, 64), np.uint8)
    mgr.wsi_inst_info = {}
    mgr._pred_map_path = str(tmp_path / "pred_map.npy")
    np.save(mgr._pred_map_path, pred)
    mgr.wsi_inst_map = np.zeros(shape, np.int32)

    tg, tb, tc = wsi_tile_grids(np.array(shape), np.array([256, 256]), 32)
    # the degenerate trailing row/column is present in the raw grid
    assert any((br - tl).min() <= 0 for tl, br in tg)
    mgr._dispatch_post_processing(tg, mgr._cb_normal_tile, "phase1")
    mgr._dispatch_post_processing(tb, mgr._cb_fixing_tile, "phase2")
    mgr._dispatch_post_processing(tc, mgr._cb_fixing_tile, "phase3")

    got = remap_label(mgr.wsi_inst_map)
    assert got.max() > 0
    map_ids = set(np.unique(mgr.wsi_inst_map).tolist()) - {0}
    assert map_ids == set(mgr.wsi_inst_info.keys())


def test_finalize_pool_matches_sequential(tmp_path):
    """The host-finalize thread pool (parallel per-window remap/stats/
    contour extraction) must produce byte-identical results to the
    sequential path — callbacks stay ordered, only the pure extraction
    fans out."""
    from hover_net_tpu.infer.wsi import WSIInferManager

    rng = np.random.default_rng(7)
    shape = (700, 600)
    inst_gt = _paint_nuclei(shape, rng, 150)
    hv = gen_instance_hv_map(inst_gt, shape)
    pred = np.dstack([(inst_gt > 0).astype(np.float32),
                      hv[..., 0], hv[..., 1]]).astype(np.float32)

    results = []
    for workers in (1, 3):
        mgr = WSIInferManager.__new__(WSIInferManager)
        mgr.nr_types = None
        mgr.tile_shape = 256
        mgr.ambiguous_size = 32
        mgr.finalize_workers = workers
        mgr.wsi_proc_shape = np.array(shape)
        mgr.wsi_mask = np.ones((70, 60), np.uint8)
        mgr.wsi_inst_info = {}
        mgr._pred_map_path = str(tmp_path / f"pred_{workers}.npy")
        np.save(mgr._pred_map_path, pred)
        mgr.wsi_inst_map = np.zeros(shape, np.int32)

        tg, tb, tc = wsi_tile_grids(np.array(shape), np.array([256, 256]), 32)
        mgr._dispatch_post_processing(tg, mgr._cb_normal_tile, "p1")
        mgr._dispatch_post_processing(tb, mgr._cb_fixing_tile, "p2")
        mgr._dispatch_post_processing(tc, mgr._cb_fixing_tile, "p3")
        results.append((mgr.wsi_inst_map.copy(), dict(mgr.wsi_inst_info)))

    (map1, info1), (map3, info3) = results
    assert np.array_equal(map1, map3)
    assert info1.keys() == info3.keys()
    for k in info1:
        assert np.array_equal(info1[k]["contour"], info3[k]["contour"])
        assert np.allclose(info1[k]["centroid"], info3[k]["centroid"])


def test_hbm_resident_postproc_matches_mmap(tmp_path):
    """The HBM-resident pred-buffer path (device window slices +
    on-device validity masks) produces the same instances as the
    host-staged mmap path."""
    from hover_net_tpu.infer.wsi import WSIInferManager

    rng = np.random.default_rng(5)
    shape = (700, 600)
    inst_gt = _paint_nuclei(shape, rng, 100)
    hv = gen_instance_hv_map(inst_gt, shape)
    pred = np.dstack([(inst_gt > 0).astype(np.float32),
                      hv[..., 0], hv[..., 1]]).astype(np.float16)

    def run(dev_mode):
        mgr = WSIInferManager.__new__(WSIInferManager)
        mgr.nr_types = None
        mgr.tile_shape = 256
        mgr.ambiguous_size = 32
        mgr.wsi_proc_shape = np.array(shape)
        mgr.wsi_mask = np.ones((70, 60), np.uint8)
        mgr.wsi_inst_info = {}
        mgr.wsi_inst_map = np.zeros(shape, np.int32)
        mgr._fwd_fns = {}
        if dev_mode:
            mgr._pred_dev_mode = True
            bh = -(-(shape[0] + 164) // 256) * 256
            bw = -(-(shape[1] + 164) // 256) * 256
            buf = np.zeros((bh, bw, 3), np.float16)
            buf[: shape[0], : shape[1]] = pred
            # slack garbage must not leak into results
            buf[shape[0]:, :] = 7.0
            buf[:, shape[1]:] = 7.0
            mgr._pred_dev = jnp.asarray(buf)
        else:
            mgr._pred_map_path = str(tmp_path / f"pred_{dev_mode}.npy")
            np.save(mgr._pred_map_path, pred)
        tg, tb, tc = wsi_tile_grids(np.array(shape),
                                    np.array([256, 256]), 32)
        mgr._dispatch_post_processing(tg, mgr._cb_normal_tile, "p1")
        mgr._dispatch_post_processing(tb, mgr._cb_fixing_tile, "p2")
        mgr._dispatch_post_processing(tc, mgr._cb_fixing_tile, "p3")
        return remap_label(mgr.wsi_inst_map), mgr.wsi_inst_info

    got_dev, info_dev = run(True)
    got_mmap, info_mmap = run(False)
    assert int(got_dev.max()) == int(got_mmap.max())
    assert len(info_dev) == len(info_mmap)
    aji = get_fast_aji(got_mmap, got_dev)
    assert aji > 0.999, aji


@pytest.mark.slow
def test_wsi_full_pipeline_plumbing(tmp_path):
    """End-to-end on a pseudo-slide with a tiny random model: runs all
    stages and writes the json contract."""
    import jax
    from hover_net_tpu.infer.wsi import WSIInferManager
    from hover_net_tpu.models import HoVerNet, HoVerNetConfig
    from hover_net_tpu.models.checkpoints import save_checkpoint

    cfg = HoVerNetConfig(mode="fast", nr_types=None, width=8)
    model = HoVerNet(cfg)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)), train=False
    ))()
    ckpt_path = str(tmp_path / "tiny.msgpack")
    save_checkpoint(ckpt_path, variables)

    rng = np.random.default_rng(2)
    slide = np.full((600, 500, 3), 235, np.uint8)
    inst = _paint_nuclei((600, 500), rng, 40)
    slide[inst > 0] = (130, 80, 150)
    in_dir = tmp_path / "wsi_in"
    mask_dir = tmp_path / "masks"
    os.makedirs(in_dir)
    os.makedirs(mask_dir)
    np.save(str(in_dir / "sample.npy"), slide)
    # explicit tissue mask (the Otsu fallback assumes real-WSI-sized
    # 1.25x thumbnails; a 600px pseudo-slide's thumb is ~19px)
    import cv2

    cv2.imwrite(str(mask_dir / "sample.png"),
                np.full((60, 50), 255, np.uint8))

    mgr = WSIInferManager(
        model_path=ckpt_path, mode="fast", nr_types=None, width=8,
        batch_size=8, dtype=jnp.float32, chunk_shape=1000, tile_shape=256,
        ambiguous_size=32, proc_mag=40,
        cache_path=str(tmp_path / "cache"),
    )
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir, exist_ok=True)
    mgr.process_wsi_list(str(in_dir), out_dir, input_mask_dir=str(mask_dir))

    out_json = f"{out_dir}/sample.json"
    assert os.path.exists(out_json)
    with open(out_json) as f:
        payload = json.load(f)
    assert payload["mag"] == 40
    assert isinstance(payload["nuc"], dict)
    # resume: second run skips
    mgr.process_wsi_list(str(in_dir), out_dir)
