"""Seam guard for the blocked-VMEM post-proc kernel.

The blocked kernel's contract (ops/post_proc_pallas.py) only guarantees
exactness for components whose extent stays within the halo. These tests
cover the three layers of the guard:

1. the detector geometry (seam_suspects),
2. a real interpret-mode fragmentation: a 300-px blob on a map solved
   with small core/halo fragments across block seams, the detector
   flags the fragments, and the exact scan path restores the oracle
   answer (the VERDICT's adversarial scenario, scaled to interpret-mode
   wall time),
3. the manager plumbing: a force-flagged window/tile re-solves through
   the exact fallback and reproduces the unguarded result.
"""

import logging

import numpy as np
import pytest

import jax.numpy as jnp

from hover_net_tpu.metrics import get_fast_aji, remap_label
from hover_net_tpu.ops.post_proc_device import seam_suspects
from hover_net_tpu.ops.post_proc_host import proc_np_hv
from hover_net_tpu.ops.targets import gen_instance_hv_map


def test_detector_geometry():
    geom = (384, 64)  # the TPU default for >512 maps
    hw = (1148, 1148)
    # 300-px blob straddling the 384 gridline: flagged
    assert seam_suspects(np.array([[100, 400, 500, 560]]), *hw, geom=geom)[0]
    # fragment starting exactly ON the seam (the cut signature): flagged
    assert seam_suspects(np.array([[384, 584, 500, 560]]), *hw, geom=geom)[0]
    # wide variant across a column gridline
    assert seam_suspects(np.array([[500, 560, 100, 400]]), *hw, geom=geom)[0]
    # ordinary nucleus straddling a seam (extent <= halo): clean
    assert not seam_suspects(np.array([[350, 410, 500, 560]]), *hw,
                             geom=geom).any()
    # giant instance fully inside one block (no seam contact): clean
    assert not seam_suspects(np.array([[400, 700, 400, 700]]), *hw,
                             geom=geom).any()
    # geom=None outside the blocked path (CPU backend): everything clean
    assert not seam_suspects(np.array([[100, 400, 500, 560]]), *hw).any()


def _blob_pred(shape, r0, r1, c0, c1):
    """One giant rectangular blob with its HV maps."""
    inst = np.zeros(shape, np.int32)
    inst[r0:r1, c0:c1] = 1
    hv = gen_instance_hv_map(inst, shape)
    return inst, np.dstack([(inst > 0).astype(np.float32),
                            hv[..., 0], hv[..., 1]]).astype(np.float32)


def test_giant_blob_fragments_detected_and_exact_resolve():
    """A blob much taller than core + 2*halo MUST fragment in the
    blocked solve (each window seeds labels from its own truncated
    view); the detector flags it from the output bboxes alone, and the
    exact path matches the host oracle."""
    from hover_net_tpu.ops.post_proc_device import proc_np_hv_batch
    from hover_net_tpu.ops.post_proc_pallas import proc_np_hv_blocked

    shape = (320, 256)
    core, halo = 64, 48
    inst_gt, pred = _blob_pred(shape, 10, 310, 100, 150)  # 300px tall

    blocked = remap_label(np.asarray(proc_np_hv_blocked(
        jnp.asarray(pred[None]), core=core, halo=halo, interpret=True))[0])
    n_frag = int(blocked.max())
    assert n_frag >= 2, "expected the contract violation to fragment"

    # detector: bboxes of the blocked output
    bbs = []
    for lab in range(1, n_frag + 1):
        ys, xs = np.nonzero(blocked == lab)
        bbs.append([ys.min(), ys.max() + 1, xs.min(), xs.max() + 1])
    sus = seam_suspects(np.array(bbs), *shape, geom=(core, halo))
    assert sus.any(), "detector missed the fragmentation"

    # the exact fallback path restores the oracle answer
    exact = remap_label(np.asarray(proc_np_hv_batch(
        jnp.asarray(pred[None]), exact=True))[0])
    want = remap_label(proc_np_hv(pred))
    assert int(exact.max()) == int(want.max())
    aji = get_fast_aji(want, exact)
    assert aji > 0.999, aji


def test_wsi_finalize_seam_fallback(tmp_path, monkeypatch, caplog):
    """A flagged WSI window re-solves through _post_proc_box(exact=True)
    and produces the same instances as the unguarded run (on CPU both
    are the scan path — this validates the fallback plumbing)."""
    from hover_net_tpu.data.tiling import wsi_tile_grids
    from hover_net_tpu.infer.wsi import WSIInferManager
    from hover_net_tpu.ops import post_proc_device

    rng = np.random.default_rng(11)
    shape = (300, 260)
    inst = np.zeros(shape, np.int32)
    yy, xx = np.mgrid[-10:11, -10:11]
    for k in range(1, 30):
        cy, cx = rng.integers(12, shape[0] - 12), rng.integers(12, shape[1] - 12)
        m = (yy**2 + xx**2) <= 64
        sub = inst[cy - 10 : cy + 11, cx - 10 : cx + 11]
        sub[m & (sub == 0)] = k
    hv = gen_instance_hv_map(inst, shape)
    pred = np.dstack([(inst > 0).astype(np.float32),
                      hv[..., 0], hv[..., 1]]).astype(np.float32)

    def run(flag_all):
        if flag_all:
            monkeypatch.setattr(
                post_proc_device, "seam_suspects",
                lambda bbox, h, w, geom=None: np.ones(
                    (np.asarray(bbox).shape[0],), bool),
            )
        else:
            monkeypatch.undo()
        mgr = WSIInferManager.__new__(WSIInferManager)
        mgr.nr_types = None
        mgr.tile_shape = 256
        mgr.ambiguous_size = 32
        mgr.wsi_proc_shape = np.array(shape)
        mgr.wsi_mask = np.ones((30, 26), np.uint8)
        mgr.wsi_inst_info = {}
        mgr.wsi_inst_map = np.zeros(shape, np.int32)
        mgr._pred_map_path = str(tmp_path / f"pred_{flag_all}.npy")
        np.save(mgr._pred_map_path, pred)
        tg, tb, tc = wsi_tile_grids(np.array(shape), np.array([256, 256]), 32)
        mgr._dispatch_post_processing(tg, mgr._cb_normal_tile, "p1")
        mgr._dispatch_post_processing(tb, mgr._cb_fixing_tile, "p2")
        mgr._dispatch_post_processing(tc, mgr._cb_fixing_tile, "p3")
        return remap_label(mgr.wsi_inst_map), mgr.wsi_inst_info

    with caplog.at_level(logging.WARNING, logger="hover_net_tpu"):
        got_guard, info_guard = run(True)
    assert any("seam guard" in r.message for r in caplog.records)
    got_plain, info_plain = run(False)
    np.testing.assert_array_equal(got_guard, got_plain)
    assert len(info_guard) == len(info_plain)


def test_wsi_seam_guard_escalation_cap(tmp_path, monkeypatch, caplog):
    """When the guard trips on more windows than _SEAM_REFINE_CAP (a
    degenerate prediction), the manager escalates: logs the degenerate-
    prediction error once and flips the REMAINING windows to the exact
    path directly (no more double blocked+exact solves) — and the
    instances still match the unguarded run."""
    from hover_net_tpu.data.tiling import wsi_tile_grids
    from hover_net_tpu.infer.wsi import WSIInferManager
    from hover_net_tpu.ops import post_proc_device

    rng = np.random.default_rng(12)
    shape = (300, 260)
    inst = np.zeros(shape, np.int32)
    yy, xx = np.mgrid[-8:9, -8:9]
    for k in range(1, 40):
        cy, cx = rng.integers(10, shape[0] - 10), rng.integers(10, shape[1] - 10)
        m = (yy**2 + xx**2) <= 49
        sub = inst[cy - 8 : cy + 9, cx - 8 : cx + 9]
        sub[m & (sub == 0)] = k
    hv = gen_instance_hv_map(inst, shape)
    pred = np.dstack([(inst > 0).astype(np.float32),
                      hv[..., 0], hv[..., 1]]).astype(np.float32)

    def run(flag_all, cap):
        if flag_all:
            monkeypatch.setattr(
                post_proc_device, "seam_suspects",
                lambda bbox, h, w, geom=None: np.ones(
                    (np.asarray(bbox).shape[0],), bool),
            )
        else:
            monkeypatch.undo()
        mgr = WSIInferManager.__new__(WSIInferManager)
        mgr.nr_types = None
        mgr.tile_shape = 64  # small windows -> many boxes trip the cap
        mgr.ambiguous_size = 16
        mgr._SEAM_REFINE_CAP = cap
        mgr.wsi_proc_shape = np.array(shape)
        mgr.wsi_mask = np.ones((30, 26), np.uint8)
        mgr.wsi_inst_info = {}
        mgr.wsi_inst_map = np.zeros(shape, np.int32)
        mgr._pred_map_path = str(tmp_path / f"pred_{flag_all}_{cap}.npy")
        np.save(mgr._pred_map_path, pred)
        tg, tb, tc = wsi_tile_grids(np.array(shape), np.array([64, 64]), 16)
        mgr._dispatch_post_processing(tg, mgr._cb_normal_tile, "p1")
        mgr._dispatch_post_processing(tb, mgr._cb_fixing_tile, "p2")
        mgr._dispatch_post_processing(tc, mgr._cb_fixing_tile, "p3")
        return remap_label(mgr.wsi_inst_map), mgr.wsi_inst_info, mgr

    with caplog.at_level(logging.WARNING, logger="hover_net_tpu"):
        got_guard, info_guard, mgr_g = run(True, cap=2)
    assert mgr_g._force_exact, "cap never escalated"
    assert any("degenerate" in r.message for r in caplog.records)
    # windows solved after the flip skip the guard entirely
    assert mgr_g._seam_refines >= 2
    got_plain, info_plain, _ = run(False, cap=2)
    np.testing.assert_array_equal(got_guard, got_plain)
    assert len(info_guard) == len(info_plain)


def test_tile_finalize_seam_fallback(tmp_path, monkeypatch, caplog):
    """A flagged tile re-solves via make_pp_refine and reproduces the
    unguarded output."""
    import jax

    from hover_net_tpu.infer.tile import TileInferManager
    from hover_net_tpu.models import HoVerNet, HoVerNetConfig
    from hover_net_tpu.models.checkpoints import save_checkpoint
    from hover_net_tpu.ops import post_proc_device

    cfg = HoVerNetConfig(mode="fast", nr_types=None, width=8)
    model = HoVerNet(cfg)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)), train=False
    ))()
    ckpt = str(tmp_path / "m.msgpack")
    save_checkpoint(ckpt, variables)

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (180, 200, 3), dtype=np.uint8)

    mgr = TileInferManager(model_path=ckpt, mode="fast", nr_types=None,
                           width=8, batch_size=4, dtype=jnp.float32)
    out_plain = mgr.predict_image(img)

    monkeypatch.setattr(
        post_proc_device, "seam_suspects",
        lambda bbox, h, w, geom=None: np.ones(
            (np.asarray(bbox).shape[0],), bool),
    )
    with caplog.at_level(logging.WARNING, logger="hover_net_tpu"):
        out_guard = mgr.predict_image(img)
    # the guard only trips if the random-weight forward found instances;
    # either way the outputs must agree
    np.testing.assert_allclose(out_plain[0], out_guard[0], atol=1e-5)
    np.testing.assert_array_equal(out_plain[1], out_guard[1])
    assert len(out_plain[2]) == len(out_guard[2])
