"""Edge-case coverage: original-mode fused pipeline, WSI boxes
overrunning slide bounds, tiny slides."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hover_net_tpu.data.tiling import prepare_tile_patching, wsi_tile_grids
from hover_net_tpu.infer.steps import make_tile_pipeline
from hover_net_tpu.models import HoVerNet, HoVerNetConfig
from hover_net_tpu.ops.targets import gen_instance_hv_map
from hover_net_tpu.metrics import remap_label, get_fast_aji


def test_original_mode_fused_pipeline():
    """270->80 mode through the fused tile pipeline (the e2e tests use
    fast mode; this pins the original-mode geometry end-to-end)."""
    cfg = HoVerNetConfig(mode="original", nr_types=None, width=8)
    model = HoVerNet(cfg)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 270, 270, 3)), train=False
    ))()

    rng = np.random.default_rng(0)
    src_h, src_w = 150, 170
    img = rng.integers(0, 255, (src_h, src_w, 3), dtype=np.uint8)
    win, step = cfg.patch_input_shape, cfg.patch_output_shape
    assert (win, step) == (270, 80)
    pads, coords, grid = prepare_tile_patching((src_h, src_w), win, step)
    padded = np.pad(img, ((pads[0], pads[1]), (pads[2], pads[3]), (0, 0)),
                    mode="reflect")
    run = make_tile_pipeline(model, grid, (src_h, src_w), batch=4)
    full, inst, _nlab, tp, _tables = run(variables, jnp.asarray(padded),
                         jnp.asarray(coords, jnp.int32))
    assert full.shape == (src_h, src_w, 3)
    assert inst.shape == (src_h, src_w)
    assert np.isfinite(np.asarray(full)).all()


def test_wsi_stitching_tiny_slide_with_overrunning_boxes(tmp_path):
    """Tile/strip boxes extend past the slide bounds on a slide barely
    larger than one tile; stitching must still match single-shot."""
    from hover_net_tpu.infer.wsi import WSIInferManager
    from hover_net_tpu.ops.post_proc_device import proc_np_hv_batch

    rng = np.random.default_rng(3)
    shape = (300, 260)
    inst_gt = np.zeros(shape, np.int32)
    yy, xx = np.mgrid[-12:13, -12:13]
    k = 1
    for _ in range(25):
        cy = rng.integers(14, shape[0] - 14)
        cx = rng.integers(14, shape[1] - 14)
        r = rng.integers(6, 11)
        m = (yy**2 + xx**2) <= r * r
        sub = inst_gt[cy - 12 : cy + 13, cx - 12 : cx + 13]
        sub[m & (sub == 0)] = k
        k += 1
    hv = gen_instance_hv_map(inst_gt, shape)
    pred = np.dstack([(inst_gt > 0).astype(np.float32),
                      hv[..., 0], hv[..., 1]]).astype(np.float32)

    mgr = WSIInferManager.__new__(WSIInferManager)
    mgr.nr_types = None
    mgr.tile_shape = 256
    mgr.ambiguous_size = 32
    mgr.wsi_proc_shape = np.array(shape)
    mgr.wsi_mask = np.ones((30, 26), np.uint8)
    mgr.wsi_inst_info = {}
    mgr._pred_map_path = str(tmp_path / "pred_map.npy")
    np.save(mgr._pred_map_path, pred)
    mgr.wsi_inst_map = np.zeros(shape, np.int32)

    tg, tb, tc = wsi_tile_grids(np.array(shape), np.array([256, 256]), 32)
    assert (tb[:, 1] > np.array(shape)).any(), "test should cover overrun"
    mgr._dispatch_post_processing(tg, mgr._cb_normal_tile, "p1")
    mgr._dispatch_post_processing(tb, mgr._cb_fixing_tile, "p2")
    mgr._dispatch_post_processing(tc, mgr._cb_fixing_tile, "p3")

    whole = remap_label(np.asarray(proc_np_hv_batch(jnp.asarray(pred[None])))[0])
    got = remap_label(mgr.wsi_inst_map)
    assert abs(int(got.max()) - int(whole.max())) <= 1
    if whole.max() > 0:
        assert get_fast_aji(whole, got) > 0.95


def test_wsi_read_window_box_fully_outside_slide(tmp_path):
    """A canonical window anchored past both slide dims must read as an
    all-invalid zero window rather than crash or alias memory
    (NOTES-flagged: numpy clamping was load-bearing here)."""
    from hover_net_tpu.infer.wsi import WSIInferManager

    shape = (100, 120)
    pred = np.zeros(shape + (3,), np.float32)
    mgr = WSIInferManager.__new__(WSIInferManager)
    mgr.nr_types = None
    mgr.wsi_proc_shape = np.array(shape)
    path = str(tmp_path / "pred_map.npy")
    np.save(path, pred)
    pm = np.load(path, mmap_mode="r")

    # box entirely beyond the bottom-right corner
    tl = np.array([160, 200])
    br = np.array([224, 264])
    window, valid, (y0, y1, x0, x1) = mgr._read_window(pm, tl, br)
    assert not valid.any()
    assert (y1 - y0) * (x1 - x0) == 0  # downstream slices are empty
    assert (window == 0).all()

    # box partially overrunning: valid must cover only in-slide pixels
    tl = np.array([64, 96])
    br = np.array([128, 160])
    window, valid, (y0, y1, x0, x1) = mgr._read_window(pm, tl, br)
    assert valid.sum() == (100 - 64) * (120 - 96)
