"""Native instance-table extractor vs a straightforward Python loop."""

import numpy as np
import pytest

from hover_net_tpu.ops.instance_table import instance_table, apply_lut, _build_lib
from hover_net_tpu.ops.post_proc_host import extract_instance_info
from hover_net_tpu.metrics import remap_label


def random_labels(rng, shape=(90, 110), n=12):
    lab = np.zeros(shape, np.int32)
    yy, xx = np.mgrid[: shape[0], : shape[1]]
    k = 1
    for _ in range(n):
        cy, cx = rng.integers(10, shape[0] - 10), rng.integers(10, shape[1] - 10)
        r = rng.integers(3, 9)
        m = ((yy - cy) ** 2 + (xx - cx) ** 2) <= r * r
        m &= lab == 0
        if m.sum() > 3:
            lab[m] = k
            k += 1
    return lab


def test_native_lib_builds():
    assert _build_lib() is not None, "g++ build of native/instance_table.cpp failed"


def test_table_matches_python_loop():
    rng = np.random.default_rng(0)
    lab = random_labels(rng)
    tmap = np.where(lab > 0, (lab % 3) + 1, 0).astype(np.int32)
    bbox, centroid, size, hist = instance_table(lab, tmap, n_types=5)

    n = lab.max()
    assert bbox.shape == (n, 4)
    for i in range(1, n + 1):
        m = lab == i
        ys, xs = np.nonzero(m)
        assert bbox[i - 1].tolist() == [ys.min(), ys.max() + 1, xs.min(), xs.max() + 1]
        np.testing.assert_allclose(centroid[i - 1], [xs.mean(), ys.mean()])
        assert size[i - 1] == m.sum()
        expect_hist = np.bincount(tmap[m], minlength=5)
        np.testing.assert_array_equal(hist[i - 1], expect_hist)


def test_extract_instance_info_types_and_contours():
    rng = np.random.default_rng(1)
    lab = remap_label(random_labels(rng))
    tmap = np.where(lab > 0, ((lab - 1) % 3) + 1, 0).astype(np.int32)
    lab, info = extract_instance_info(lab, tmap)
    assert set(info.keys()) <= set(range(1, lab.max() + 1))
    for inst_id, inst in info.items():
        m = lab == inst_id
        ys, xs = np.nonzero(m)
        np.testing.assert_allclose(inst["centroid"], [xs.mean(), ys.mean()])
        assert inst["type"] == ((inst_id - 1) % 3) + 1
        assert inst["type_prob"] > 0.99
        # contour points lie on the instance
        cont = inst["contour"]
        assert np.all(lab[cont[:, 1], cont[:, 0]] == inst_id)


def test_trace_contours_bit_exact_vs_cv2():
    """Native border following == cv2.findContours CHAIN_APPROX_SIMPLE,
    point for point (connected instances; order, start and compression
    all match)."""
    import cv2

    from hover_net_tpu.ops.instance_table import trace_contours

    rng = np.random.default_rng(11)
    checked = 0
    for _ in range(6):
        lab = remap_label(random_labels(rng, shape=(120, 140), n=25))
        bbox, _, size, _ = instance_table(lab)
        native = trace_contours(lab, bbox)
        assert native is not None
        for idx in range(lab.max()):
            if size[idx] == 0:
                continue
            rmin, rmax, cmin, cmax = (int(v) for v in bbox[idx])
            m = (lab[rmin:rmax, cmin:cmax] == idx + 1).astype(np.uint8)
            if cv2.connectedComponents(m)[0] > 2:
                # disconnected label (overlap-split synthetic disk):
                # cv2's contours[0] is its last-found fragment, ours the
                # topmost one — watershed output is always connected,
                # so the case cannot occur in the pipeline
                continue
            cs, _ = cv2.findContours(m, cv2.RETR_TREE,
                                     cv2.CHAIN_APPROX_SIMPLE)
            ref = np.squeeze(cs[0].astype(np.int32))
            if ref.ndim == 1:
                ref = ref[None]
            ref = ref + np.array([cmin, rmin], np.int32)
            np.testing.assert_array_equal(native[idx], ref)
            checked += 1
    assert checked > 50


def test_extract_instance_info_native_vs_cv2_fallback(monkeypatch):
    """The full inst_info dict is identical through the native contour
    pass and the per-instance cv2 fallback."""
    import hover_net_tpu.ops.instance_table as it

    import cv2

    rng = np.random.default_rng(12)
    lab = remap_label(random_labels(rng, shape=(100, 100), n=15))
    # drop overlap-split (disconnected) labels: cv2's contours[0] picks
    # an arbitrary fragment there (see test above); watershed output is
    # always connected
    for i in range(1, lab.max() + 1):
        m = (lab == i).astype(np.uint8)
        if cv2.connectedComponents(m)[0] > 2:
            lab[lab == i] = 0
    lab = remap_label(lab)
    tmap = np.where(lab > 0, (lab % 3) + 1, 0).astype(np.int32)

    m_native, native = extract_instance_info(lab.copy(), tmap)
    monkeypatch.setattr(it, "trace_contours", lambda *a, **k: None)
    m_cv2, fallback = extract_instance_info(lab.copy(), tmap)

    np.testing.assert_array_equal(m_native, m_cv2)
    assert native.keys() == fallback.keys()
    for k in native:
        np.testing.assert_array_equal(native[k]["contour"],
                                      fallback[k]["contour"])
        np.testing.assert_allclose(native[k]["centroid"],
                                   fallback[k]["centroid"])
        assert native[k]["type"] == fallback[k]["type"]


def test_apply_lut():
    lab = np.array([[0, 1, 2], [2, 3, 0]], np.int32)
    lut = np.array([0, 5, 0, 7], np.int32)
    out = apply_lut(lab.copy(), lut)
    np.testing.assert_array_equal(out, [[0, 5, 0], [0, 7, 0]])


def test_fallback_matches_native(monkeypatch):
    import hover_net_tpu.ops.instance_table as it

    rng = np.random.default_rng(2)
    lab = random_labels(rng)
    tmap = np.where(lab > 0, (lab % 4), 0).astype(np.int32)
    native = instance_table(lab, tmap, n_types=6)
    monkeypatch.setattr(it, "_LIB", None)
    monkeypatch.setattr(it, "_LIB_FAILED", True)
    fallback = it.instance_table(lab, tmap, n_types=6)
    for a, b in zip(native, fallback):
        np.testing.assert_allclose(a, b)


def test_map_and_info_never_desynchronize():
    """Property: every nonzero id in the returned map has a dict entry,
    ids are contiguous, even for adversarial 1-2 px artifact instances
    whose contours degenerate below 3 points."""
    rng = np.random.default_rng(7)
    for _ in range(10):
        lab = np.zeros((64, 64), np.int32)
        nid = 1
        for _ in range(8):  # normal blobs
            cy, cx = rng.integers(5, 59, 2)
            r = int(rng.integers(2, 5))
            yy, xx = np.mgrid[:64, :64]
            lab[((yy - cy) ** 2 + (xx - cx) ** 2) <= r * r] = nid
            nid += 1
        for _ in range(4):  # 1-2 px artifacts
            y, x = rng.integers(0, 64, 2)
            lab[y, x] = nid
            nid += 1
        lab = remap_label(lab)
        tmap = np.where(lab > 0, 1, 0).astype(np.int32)
        before = lab.copy()
        synced, info = extract_instance_info(lab, tmap)
        np.testing.assert_array_equal(lab, before)  # input not mutated
        map_ids = set(np.unique(synced)) - {0}
        assert map_ids == set(info.keys())
        if map_ids:
            assert max(map_ids) == len(map_ids)  # contiguous
        # surviving pixels unchanged geometrically
        assert ((synced > 0) <= (before > 0)).all()


def test_coo_tables_match_map_path(rng):
    """Device instance_tables + native COO tracer must reproduce the
    dense-map finalization exactly: same contours (cv2-bit-exact
    chains), centroids, bboxes, types."""
    import jax.numpy as jnp

    from hover_net_tpu.ops.post_proc_device import instance_tables
    from hover_net_tpu.ops.post_proc_host import (
        extract_instance_info,
        instance_info_from_tables,
    )

    h, w = 200, 240
    inst = np.zeros((h, w), np.int32)
    yy, xx = np.mgrid[-14:15, -14:15]
    k = 1
    for _ in range(40):
        cy, cx = int(rng.integers(15, h - 15)), int(rng.integers(15, w - 15))
        r = int(rng.integers(1, 13))  # includes 1-2 px artifacts
        m = (yy**2 + xx**2) <= r * r
        sub = inst[cy - 14 : cy + 15, cx - 14 : cx + 15]
        sub[m & (sub == 0)] = k
        k += 1
    # contiguous ids
    from hover_net_tpu.metrics import remap_label

    inst = remap_label(inst)
    n = int(inst.max())
    tmap = np.where(inst > 0, (inst % 3) + 1, 0).astype(np.uint8)

    tables = instance_tables(
        jnp.asarray(inst), jnp.asarray(tmap), coo_cap=h * w, nr_types=5
    )
    host_tables = {k2: np.asarray(v) for k2, v in tables.items()}
    info_t, lut = instance_info_from_tables(host_tables, n, typed=True)
    assert info_t is not None

    ref_map, info_m = extract_instance_info(inst.copy(), tmap.astype(np.int32),
                                            n_types=5)
    assert set(info_t.keys()) == set(info_m.keys())
    for i in info_m:
        a, b = info_m[i], info_t[i]
        np.testing.assert_array_equal(a["contour"], b["contour"])
        np.testing.assert_array_equal(a["bbox"], b["bbox"])
        np.testing.assert_allclose(a["centroid"], b["centroid"], atol=1e-9)
        assert a["type"] == b["type"]
        assert abs(a["type_prob"] - b["type_prob"]) < 1e-9
    # the lut produced by the tables path matches the map erasure
    if lut is not None:
        from hover_net_tpu.ops.instance_table import apply_lut

        np.testing.assert_array_equal(apply_lut(inst.copy(), lut), ref_map)
    else:
        np.testing.assert_array_equal(inst, ref_map)


def test_untyped_tables_without_sums_match_map_path(rng):
    """with_sums=False (the untyped production config: no full-pixel
    device scatter) + host boundary-run reconstruction must reproduce
    the dense-map finalization exactly — sizes, centroids, bboxes,
    contours."""
    import jax.numpy as jnp

    from hover_net_tpu.ops.post_proc_device import instance_tables
    from hover_net_tpu.ops.post_proc_host import (
        extract_instance_info,
        instance_info_from_tables,
        sums_from_runs,
    )
    from hover_net_tpu.metrics import remap_label

    h, w = 180, 220
    inst = np.zeros((h, w), np.int32)
    yy, xx = np.mgrid[-14:15, -14:15]
    k = 1
    for _ in range(35):
        cy, cx = int(rng.integers(15, h - 15)), int(rng.integers(15, w - 15))
        r = int(rng.integers(1, 13))
        m = (yy**2 + xx**2) <= r * r
        sub = inst[cy - 14 : cy + 15, cx - 14 : cx + 15]
        sub[m & (sub == 0)] = k
        k += 1
    # a concave instance (C shape): multiple runs per row
    inst[20:24, 5:25] = k
    inst[24:36, 5:9] = k
    inst[36:40, 5:25] = k
    inst = remap_label(inst)
    n = int(inst.max())

    tables = instance_tables(jnp.asarray(inst), coo_cap=h * w,
                             with_sums=False)
    assert "size" not in tables and "sum_yx" not in tables
    host_tables = {k2: np.asarray(v) for k2, v in tables.items()}

    # the run reconstruction alone is pixel-exact vs bincount truth
    coo_n = int(host_tables["coo_n"])
    size_r, sum_r = sums_from_runs(
        host_tables["coo"][:coo_n, 0], host_tables["coo"][:coo_n, 1], n)
    flat = inst.ravel()
    np.testing.assert_array_equal(
        size_r[1:], np.bincount(flat, minlength=n + 1)[1:])
    ys_all, xs_all = np.nonzero(inst)
    lab_all = inst[ys_all, xs_all]
    np.testing.assert_array_equal(
        sum_r[1:, 0],
        np.bincount(lab_all, weights=ys_all, minlength=n + 1)[1:])
    np.testing.assert_array_equal(
        sum_r[1:, 1],
        np.bincount(lab_all, weights=xs_all, minlength=n + 1)[1:])

    info_t, lut = instance_info_from_tables(host_tables, n, typed=False)
    assert info_t is not None
    ref_map, info_m = extract_instance_info(inst.copy(), None)
    assert set(info_t.keys()) == set(info_m.keys())
    for i in info_m:
        a, b = info_m[i], info_t[i]
        np.testing.assert_array_equal(a["contour"], b["contour"])
        np.testing.assert_array_equal(a["bbox"], b["bbox"])
        np.testing.assert_allclose(a["centroid"], b["centroid"], atol=1e-9)


def test_fragment_labels_matches_scipy_graph():
    """Native union-find fragment labelling == the scipy csgraph
    formulation inside fix_mirror_padding (duplicate ids from mirrored
    augmentation must split identically)."""
    from hover_net_tpu.ops import instance_table as it
    from hover_net_tpu.ops.targets import fix_mirror_padding

    if it._build_lib() is None:
        import pytest

        pytest.skip("no native compiler")

    rng = np.random.default_rng(4)
    ann = np.zeros((200, 180), np.int32)
    yy, xx = np.mgrid[-6:6, -6:6]
    disk = (yy**2 + xx**2) <= 36
    for k in range(1, 70):
        cy, cx = rng.integers(8, 170, 2)
        sub = ann[cy - 6 : cy + 6, cx - 6 : cx + 6]
        sub[disk & (sub == 0)] = k % 13 + 1  # heavy id duplication
    native = fix_mirror_padding(ann)

    lib_state = (it._LIB, it._LIB_FAILED)
    try:
        it._LIB, it._LIB_FAILED = None, True  # force the scipy path
        fallback = fix_mirror_padding(ann)
    finally:
        it._LIB, it._LIB_FAILED = lib_state
    np.testing.assert_array_equal(native, fallback)
    assert native.max() > ann.max()  # fragments actually split


def test_native_json_emitter_matches_json_dump():
    """save_json's native table emitter must produce a payload that
    parses identically to CPython's tolist + json.dump (the reference
    infer/base.py:80-94 contract), for typed and untyped runs."""
    import json
    import os
    import tempfile

    import hover_net_tpu.ops.instance_table as it
    from hover_net_tpu.infer import base

    if it._build_lib() is None:
        pytest.skip("no native compiler")

    rng = np.random.default_rng(11)

    def make_info(n, typed):
        out = {}
        for i in range(1, n + 1):
            k = int(rng.integers(3, 20))
            info = {
                "bbox": np.array([[int(rng.integers(0, 9999)), 7],
                                  [88, 99]]),
                "centroid": rng.uniform(0, 99999, 2),
                "contour": rng.integers(0, 99999, (k, 2)).astype(np.int32),
                "type_prob": None,
                "type": None,
            }
            if typed:
                info["type"] = int(rng.integers(0, 6))
                info["type_prob"] = float(rng.uniform())
            out[i] = info
        return out

    for typed, mag in ((False, None), (True, 40)):
        info = make_info(150, typed)
        p_nat = os.path.join(tempfile.mkdtemp(), "a.json")
        p_ref = p_nat + ".ref"
        assert base._save_json_native(p_nat, info, mag) is not None
        nuc = {
            int(i): {k: (v.tolist() if isinstance(v, np.ndarray) else v)
                     for k, v in inf.items()}
            for i, inf in info.items()
        }
        with open(p_ref, "w") as f:
            json.dump({"mag": mag, "nuc": nuc}, f)
        with open(p_nat) as f1, open(p_ref) as f2:
            assert json.load(f1) == json.load(f2)

    # a mixed typed/None dict must fall back to json.dump, not crash
    info = make_info(10, True)
    info[3]["type"] = None
    p = os.path.join(tempfile.mkdtemp(), "c.json")
    base.save_json(p, info, 40)
    with open(p) as f:
        assert json.load(f)["nuc"]["3"]["type"] is None
