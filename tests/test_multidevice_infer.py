"""Multi-device (8 virtual chips) data-parallel tile inference."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hover_net_tpu.models import HoVerNet, HoVerNetConfig
from hover_net_tpu.models.checkpoints import save_checkpoint


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    cfg = HoVerNetConfig(mode="fast", nr_types=None, width=8)
    model = HoVerNet(cfg)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)), train=False
    ))()
    p = str(tmp_path_factory.mktemp("md") / "m.msgpack")
    save_checkpoint(p, variables)
    return p


def test_round_robin_two_devices_fast(ckpt):
    """Fast-tier guard on the threaded dispatch + device round-robin
    (the full 8-device sweep is the slow-tier test below): two devices,
    two images, results must match the single-device manager exactly."""
    from hover_net_tpu.infer.tile import TileInferManager

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (150, 170, 3), dtype=np.uint8)

    mgr1 = TileInferManager(model_path=ckpt, mode="fast", nr_types=None,
                            width=8, batch_size=4, dtype=jnp.float32,
                            n_devices=1)
    mgr2 = TileInferManager(model_path=ckpt, mode="fast", nr_types=None,
                            width=8, batch_size=4, dtype=jnp.float32,
                            n_devices=2)
    assert len(mgr2.devices) == 2

    outs = []
    for mgr in (mgr1, mgr2):
        handles = [mgr.predict_image_async(img) for _ in range(2)]
        outs.append([mgr.finalize_prediction(img, h) for h in handles])
    devs = {next(iter(h[1].devices()))
            for h in [mgr2.predict_image_async(img) for _ in range(2)]}
    assert len(devs) == 2  # placement actually rotated

    for (p1, i1, _), (p2, i2, _) in zip(outs[0], outs[1]):
        np.testing.assert_allclose(p1, p2, atol=1e-5)
        np.testing.assert_array_equal(i1, i2)


@pytest.mark.slow
def test_round_robin_devices_same_results(ckpt):
    from hover_net_tpu.infer.tile import TileInferManager

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (180, 200, 3), dtype=np.uint8)

    mgr1 = TileInferManager(model_path=ckpt, mode="fast", nr_types=None,
                            width=8, batch_size=4, dtype=jnp.float32,
                            n_devices=1)
    mgr8 = TileInferManager(model_path=ckpt, mode="fast", nr_types=None,
                            width=8, batch_size=4, dtype=jnp.float32,
                            n_devices=8)
    assert len(mgr8.devices) == 8

    outs = []
    for mgr in (mgr1, mgr8):
        handles = [mgr.predict_image_async(img) for _ in range(4)]
        outs.append([mgr.finalize_prediction(img, h) for h in handles])
    # device placement rotated (outputs on different devices)
    devs = set()
    for h in [mgr8.predict_image_async(img) for _ in range(8)]:
        devs.add(next(iter(h[1].devices())))
    assert len(devs) == 8

    for (p1, i1, _), (p8, i8, _) in zip(outs[0], outs[1]):
        np.testing.assert_allclose(p1, p8, atol=1e-5)
        np.testing.assert_array_equal(i1, i8)


# ------------------------------------------------------------------ WSI

def _paint(shape, rng, n):
    inst = np.zeros(shape, np.int32)
    yy, xx = np.mgrid[-12:13, -12:13]
    for k in range(1, n + 1):
        cy = rng.integers(14, shape[0] - 14)
        cx = rng.integers(14, shape[1] - 14)
        r = rng.integers(6, 11)
        m = (yy**2 + xx**2) <= r * r
        sub = inst[cy - 12 : cy + 13, cx - 12 : cx + 13]
        sub[m & (sub == 0)] = k
    return inst


def test_wsi_chunk_forward_sharded_matches_single(ckpt, tmp_path):
    """The mesh-sharded chunk forward writes a bit-identical pred_map."""
    from hover_net_tpu.infer.wsi import WSIInferManager
    from hover_net_tpu.data.tiling import wsi_chunk_patch_grids

    rng = np.random.default_rng(1)
    slide = rng.integers(0, 255, (600, 520, 3), dtype=np.uint8)

    maps = []
    for n_dev in (1, 8):
        mgr = WSIInferManager(
            model_path=ckpt, mode="fast", nr_types=None, width=8,
            batch_size=4, dtype=jnp.float32, chunk_shape=512,
            tile_shape=256, ambiguous_size=32, proc_mag=40,
            cache_path=str(tmp_path / f"cache{n_dev}"),
            n_devices=n_dev,
        )
        assert mgr.n_devices == n_dev

        class _H:  # minimal handler: whole slide in RAM
            def read_region(self, tl_xy, size_wh):
                x, y = int(tl_xy[0]), int(tl_xy[1])
                w, h = int(size_wh[0]), int(size_wh[1])
                out = np.zeros((h, w, 3), np.uint8)
                sub = slide[y : y + h, x : x + w]
                out[: sub.shape[0], : sub.shape[1]] = sub
                return out

        mgr.wsi_handler = _H()
        mgr.wsi_proc_shape = np.array(slide.shape[:2])
        mgr.wsi_mask = np.ones((60, 52), np.uint8)
        os.makedirs(mgr.cache_path, exist_ok=True)
        mgr._pred_map_path = f"{mgr.cache_path}/pred_map.npy"
        pm = np.lib.format.open_memmap(
            mgr._pred_map_path, mode="w+",
            shape=slide.shape[:2] + (3,), dtype=np.float32,
        )
        del pm
        chunk_info, patch_info = wsi_chunk_patch_grids(
            mgr.wsi_proc_shape, np.array([512, 512]),
            np.array([256, 256]), np.array([164, 164]),
        )
        mgr._get_raw_prediction(chunk_info, patch_info)
        maps.append(np.load(mgr._pred_map_path))

    np.testing.assert_allclose(maps[0], maps[1], atol=1e-5)
    assert np.abs(maps[0]).sum() > 0  # actually wrote something


def test_wsi_postproc_sharded_matches_single(tmp_path):
    """8-device sharded 3-phase post-proc == single-device output."""
    from hover_net_tpu.infer.wsi import WSIInferManager
    from hover_net_tpu.data.tiling import wsi_tile_grids
    from hover_net_tpu.ops.targets import gen_instance_hv_map
    from hover_net_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(5)
    shape = (700, 600)
    inst_gt = _paint(shape, rng, 100)
    hv = gen_instance_hv_map(inst_gt, shape)
    pred = np.dstack([(inst_gt > 0).astype(np.float32),
                      hv[..., 0], hv[..., 1]]).astype(np.float32)

    results = []
    for n_dev in (1, 8):
        mgr = WSIInferManager.__new__(WSIInferManager)
        mgr.nr_types = None
        mgr.tile_shape = 256
        mgr.ambiguous_size = 32
        if n_dev > 1:
            mgr.mesh = make_mesh(n_dev)
            mgr.n_devices = n_dev
            mgr._pp_fn = None
        mgr.wsi_proc_shape = np.array(shape)
        mgr.wsi_mask = np.ones((70, 60), np.uint8)
        mgr.wsi_inst_info = {}
        mgr._pred_map_path = str(tmp_path / f"pred_{n_dev}.npy")
        np.save(mgr._pred_map_path, pred)
        mgr.wsi_inst_map = np.zeros(shape, np.int32)

        tg, tb, tc = wsi_tile_grids(np.array(shape),
                                    np.array([256, 256]), 32)
        mgr._dispatch_post_processing(tg, mgr._cb_normal_tile, "p1")
        mgr._dispatch_post_processing(tb, mgr._cb_fixing_tile, "p2")
        mgr._dispatch_post_processing(tc, mgr._cb_fixing_tile, "p3")
        results.append((mgr.wsi_inst_map.copy(), dict(mgr.wsi_inst_info)))

    np.testing.assert_array_equal(results[0][0], results[1][0])
    assert set(results[0][1].keys()) == set(results[1][1].keys())


def test_wsi_striped_resident_matches_single(tmp_path):
    """Mesh-striped HBM-resident pred buffer (scatter into row stripes,
    window gather + psum_scatter reads) reproduces the single-device
    resident path bit-exactly through all 3 post-proc phases."""
    from hover_net_tpu.infer.wsi import WSIInferManager
    from hover_net_tpu.data.tiling import wsi_tile_grids
    from hover_net_tpu.models import HoVerNetConfig
    from hover_net_tpu.ops.targets import gen_instance_hv_map
    from hover_net_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(7)
    shape = (700, 600)
    inst_gt = _paint(shape, rng, 110)
    hv = gen_instance_hv_map(inst_gt, shape)
    pred = np.dstack([(inst_gt > 0).astype(np.float32),
                      hv[..., 0], hv[..., 1]]).astype(np.float16)

    cfg = HoVerNetConfig(mode="fast", nr_types=None, width=8)
    out_sz = cfg.patch_output_shape
    # non-overlapping output grid covering the map (plus slack overrun)
    ys = list(range(0, shape[0], out_sz))
    xs = list(range(0, shape[1], out_sz))
    padded = np.zeros((ys[-1] + out_sz, xs[-1] + out_sz, 3), np.float16)
    padded[: shape[0], : shape[1]] = pred
    coords = np.array([(y, x) for y in ys for x in xs], np.int32)
    patches = np.stack([padded[y:y + out_sz, x:x + out_sz]
                        for y, x in coords])

    results = []
    for n_dev in (1, 8):
        mgr = WSIInferManager.__new__(WSIInferManager)
        mgr.cfg = cfg
        mgr.nr_types = None
        mgr.tile_shape = 256
        mgr.ambiguous_size = 32
        mgr.pred_map_dtype = np.dtype("float16")
        mgr.mesh = make_mesh(n_dev) if n_dev > 1 else None
        mgr.n_devices = n_dev
        mgr._fwd_fns = {}
        mgr._pp_fn = None
        mgr.wsi_proc_shape = np.array(shape)
        mgr.wsi_mask = np.ones((70, 60), np.uint8)
        mgr.wsi_inst_info = {}
        mgr.wsi_inst_map = np.zeros(shape, np.int32)
        mgr._alloc_pred_dev(3)
        assert mgr._pred_dev_mode

        # scatter the patch outputs in batches of 8 (divides the mesh)
        scatter = mgr._scatter_fn()
        dustbin = np.array(mgr._pred_dev.shape[:2], np.int32)
        for i in range(0, len(coords), 8):
            sub = coords[i:i + 8]
            outs = patches[i:i + 8]
            if len(sub) < 8:
                pad = 8 - len(sub)
                sub = np.concatenate(
                    [sub, np.broadcast_to(dustbin, (pad, 2))])
                outs = np.concatenate(
                    [outs, np.zeros((pad,) + outs.shape[1:], outs.dtype)])
            mgr._pred_dev = scatter(
                mgr._pred_dev, jnp.asarray(outs), jnp.asarray(sub))

        tg, tb, tc = wsi_tile_grids(np.array(shape),
                                    np.array([256, 256]), 32)
        mgr._dispatch_post_processing(tg, mgr._cb_normal_tile, "p1")
        mgr._dispatch_post_processing(tb, mgr._cb_fixing_tile, "p2")
        mgr._dispatch_post_processing(tc, mgr._cb_fixing_tile, "p3")
        results.append((mgr.wsi_inst_map.copy(), dict(mgr.wsi_inst_info)))

    np.testing.assert_array_equal(results[0][0], results[1][0])
    assert set(results[0][1].keys()) == set(results[1][1].keys())
    assert int(results[0][0].max()) > 50  # actually found the nuclei


def test_masked_selection_vectorized_equivalence():
    """Summed-area-table tissue test == per-box ROI sums."""
    from hover_net_tpu.infer.wsi import WSIInferManager

    rng = np.random.default_rng(9)
    mgr = WSIInferManager.__new__(WSIInferManager)
    mgr.wsi_proc_shape = np.array([4000, 3000])
    mask = (rng.random((400, 300)) > 0.7).astype(np.uint8)
    mgr.wsi_mask = mask

    boxes = rng.integers(0, 3600, (500, 2)).astype(np.int64)
    boxes = np.stack([boxes, boxes + rng.integers(16, 400, (500, 2))],
                     axis=1)  # [N, 2(tl/br), 2(y,x)]
    out = mgr._select_masked_boxes(boxes)

    ratio = mask.shape[0] / 4000
    scaled = np.rint(boxes * ratio).astype(np.int64)
    keep = []
    for i, box in enumerate(scaled):
        roi = mask[max(box[0, 0], 0): box[1, 0], max(box[0, 1], 0): box[1, 1]]
        if roi.sum() > 0:
            keep.append(i)
    np.testing.assert_array_equal(out, boxes[keep])
