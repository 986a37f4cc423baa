"""Composed end-to-end differential parity vs the ACTUAL reference pipeline.

Runs /root/reference's own code end to end — the torch HoVerNet forward
(models/hovernet/net_desc.py), the patch grid + reassembly
(infer/tile.py:46-143 `_prepare_patching` / `_post_process_patches`),
and the full post-processing `process()`
(models/hovernet/post_proc.py:26-186; skimage.watershed shimmed with
this repo's `ops.cc_np.watershed`, the priority-flood equivalent) — and
asserts that hover_net_tpu's production TileInferManager produces the
same instance maps from the same weights, imported through the
torch-.tar converter.

Logit parity (test_torch_parity.py) and post-proc parity (vs our host
oracle) were previously proven SEPARATELY; this composes them into one
differential test of the whole pipeline, where contract drift between
the halves (channel order, softmax placement, reassembly axes, crop
origin, threshold semantics) would surface.

Weights: the reference model's own kaiming init with randomized BN
statistics plus rescaled 1x1 output heads — untrained but NON-degenerate
(the np head produces threshold-crossing blobs, hv smooth fields), so
watershed, marker morphology, and per-instance extraction all do real
work. A realistic-content variant (`test_ref_e2e_parity_trained`) uses
the width-64 checkpoint bench.py trains on synthetic nuclei, exported
back to the reference format via `save_torch_tar`, when that cache
exists on this machine.

The instance-map comparison uses the REFERENCE metrics code
(metrics/stats_utils.py get_fast_aji + remap_label).
"""

import multiprocessing
import os
import sys
import types
import warnings as _warnings

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"

pytestmark = [
    pytest.mark.slow,  # differential parity vs the real reference: minutes of
    # torch forwards — run with `pytest -m slow`
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REF, "models", "hovernet")),
        reason="reference checkout not available",
    ),
]

_REF_MODULES = {}


def _import_reference():
    """Import the reference pipeline modules, shimming skimage (absent in
    this image) with our equivalent ops, and restoring process-global
    state the reference mutates at import time (multiprocessing start
    method, warnings.warn)."""
    if _REF_MODULES:
        return _REF_MODULES

    from hover_net_tpu.ops import cc_np

    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        seg = types.ModuleType("skimage.segmentation")
        seg.watershed = cc_np.watershed
        col = types.ModuleType("skimage.color")
        sk.segmentation = seg
        sk.color = col
        sys.modules.update(
            {"skimage": sk, "skimage.segmentation": seg, "skimage.color": col}
        )
    if "termcolor" not in sys.modules:
        tc = types.ModuleType("termcolor")
        tc.colored = lambda text, *a, **k: text
        sys.modules["termcolor"] = tc
    if not hasattr(np.lib, "pad"):
        # infer/tile.py:76 uses the pre-NumPy-2.0 np.lib.pad alias
        np.lib.pad = np.pad
    if "imgaug" not in sys.modules:
        # run_utils/utils.py:9 imports it only for RNG seeding helpers
        # that this composed pipeline never calls
        iag = types.ModuleType("imgaug")
        inner = types.ModuleType("imgaug.imgaug")
        inner.seed = lambda *a, **k: None
        iag.imgaug = inner
        sys.modules.update({"imgaug": iag, "imgaug.imgaug": inner})
    if REF not in sys.path:
        sys.path.insert(0, REF)

    old_start = multiprocessing.get_start_method(allow_none=True)
    old_warn = _warnings.warn
    try:
        import importlib

        tile = importlib.import_module("infer.tile")
        post = importlib.import_module("models.hovernet.post_proc")
        stats = importlib.import_module("metrics.stats_utils")
    finally:
        # infer/tile.py:5 forces the spawn start method and
        # post_proc.py:22 no-ops warnings.warn, both process-global
        _warnings.warn = old_warn
        if old_start is not None:
            multiprocessing.set_start_method(old_start, force=True)

    _REF_MODULES.update(tile=tile, post=post, stats=stats)
    return _REF_MODULES


_NET_CACHE = {}


def _build_reference_model(mode, nr_types, seed):
    key = (mode, nr_types, seed)
    if key in _NET_CACHE:
        return _NET_CACHE[key]
    net = _build_reference_model_uncached(mode, nr_types, seed)
    _NET_CACHE[key] = net
    return net


def _build_reference_model_uncached(mode, nr_types, seed):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.hovernet.net_desc import create_model as ref_create_model

    torch.manual_seed(seed)
    net = ref_create_model(mode=mode, input_ch=3, nr_types=nr_types)
    net.eval()

    g = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.1, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
                m.weight.uniform_(0.5, 1.5, generator=g)
                m.bias.normal_(0.0, 0.1, generator=g)
        _fit_heads(net, mode, nr_types, seed)
    return net


def _fit_heads(net, mode, nr_types, seed):
    """Closed-form ridge fit of the 1x1 output heads on a probe image's
    u0 features against REAL targets (instance mask, true HV maps,
    per-instance types): a 'trained last layer' that makes the untrained
    encoder produce realistic predictions — nuclei blobs with proper HV
    gradients, so watershed/markers/type-voting all do real work — on
    a single-core CPU runner that cannot afford SGD training of the
    full-width net inside the suite."""
    from hover_net_tpu.ops.targets import gen_targets
    from hover_net_tpu.utils.crops import cropping_center

    size = 270 if mode == "original" else 256
    out_size = 80 if mode == "original" else 164
    # enough probe patches that the fit region (the centre out_size
    # crop of each) sees ~30 nuclei — one 80^2 crop of a 270^2 patch
    # alone holds ~4, far too few to regress the HV field
    k_probe = 6 if mode == "original" else 2
    imgs, targets = [], {"np": [], "hv": []}
    if nr_types:
        targets["tp"] = []
    for i in range(k_probe):
        img, inst = _synth_image(size, size, seed=seed + 2 + i, n_nuclei=80,
                                 return_inst=True)
        imgs.append(img.astype(np.float32))
        t = gen_targets(inst, (out_size, out_size))
        npm, hvm = t["np_map"], t["hv_map"]
        targets["np"].append(np.stack(
            [np.where(npm > 0, -2.0, 2.0), np.where(npm > 0, 2.0, -2.0)], -1
        ))
        targets["hv"].append(hvm)
        if nr_types:
            inst_c = cropping_center(inst, (out_size, out_size))
            tmap = np.where(inst_c > 0, (inst_c % (nr_types - 1)) + 1, 0)
            targets["tp"].append(
                np.eye(nr_types, dtype=np.float32)[tmap] * 4.0 - 2.0
            )
    targets = {k: np.stack(v) for k, v in targets.items()}

    feats = {}
    hooks = []
    for name, branch in net.decoder.items():
        conv = branch[3][2]  # u0: (bn, relu, conv)
        hooks.append(
            conv.register_forward_hook(
                lambda mod, inp, out, name=name: feats.__setitem__(
                    name, inp[0].detach()
                )
            )
        )
    net(torch.from_numpy(np.stack(imgs)).permute(0, 3, 1, 2))
    for h in hooks:
        h.remove()

    for name, branch in net.decoder.items():
        conv = branch[3][2]
        f = feats[name].permute(0, 2, 3, 1).numpy().astype(np.float64)
        f = f.reshape(-1, f.shape[-1])
        y = targets[name].reshape(f.shape[0], -1)
        mu, sd = f.mean(0), f.std(0) + 1e-6
        fz = (f - mu) / sd
        a = fz.T @ fz + 1e-2 * f.shape[0] * np.eye(f.shape[1])
        w = np.linalg.solve(a, fz.T @ y)  # [64, out_ch], standardized
        w_raw = w / sd[:, None]
        b = -(mu / sd) @ w
        conv.weight.copy_(
            torch.from_numpy(w_raw.T[:, :, None, None].astype(np.float32))
        )
        conv.bias.copy_(torch.from_numpy(b.astype(np.float32)))


def _synth_image(h, w, seed=0, n_nuclei=60, return_inst=False):
    rng = np.random.default_rng(seed)
    img = np.full((h, w, 3), 225, np.float32)
    img += rng.normal(0, 4, img.shape)
    inst = np.zeros((h, w), np.int32)
    yy, xx = np.mgrid[-12:13, -12:13]
    k = 1
    for _ in range(n_nuclei):
        cy, cx = int(rng.integers(14, h - 14)), int(rng.integers(14, w - 14))
        r = int(rng.integers(5, 11))
        m = (yy**2 + xx**2) <= r * r
        sub = inst[cy - 12 : cy + 13, cx - 12 : cx + 13]
        sub[m & (sub == 0)] = k
        k += 1
        col = np.array([120, 70, 150]) + rng.normal(0, 10, 3)
        img[cy - 12 : cy + 13, cx - 12 : cx + 13][m] = col
    img = np.clip(img, 0, 255).astype(np.uint8)
    if return_inst:
        return img, inst
    return img


def _run_reference_composed(net, img, nr_types, patch_in, patch_out, batch=2):
    """The reference tile pipeline, composed of reference code:
    _prepare_patching -> torch forward with infer_step's head math
    (run_desc.py:171-197; transcribed because the original hardcodes
    .to("cuda")) -> _post_process_patches (reassembly + process())."""
    ref = _import_reference()
    tile = ref["tile"]
    post = ref["post"]

    src_shape = img.shape
    padded, patch_info, _top = tile._prepare_patching(
        img, patch_in, patch_out, True
    )
    infos = np.concatenate(
        [patch_info, np.zeros((len(patch_info), 1), np.int32)], axis=-1
    )
    infos = [np.squeeze(p) for p in np.split(infos, len(infos), axis=0)]

    items = []
    with torch.no_grad():
        for i in range(0, len(infos), batch):
            chunk = infos[i : i + batch]
            imgs = np.stack(
                [
                    padded[
                        int(p[0]) : int(p[0]) + patch_in,
                        int(p[1]) : int(p[1]) + patch_in,
                    ]
                    for p in chunk
                ]
            )
            t = torch.from_numpy(imgs).float().permute(0, 3, 1, 2)
            pred = net(t)
            pred = {k: v.permute(0, 2, 3, 1).contiguous() for k, v in pred.items()}
            pred["np"] = torch.softmax(pred["np"], dim=-1)[..., 1:]
            if "tp" in pred:
                tp = torch.argmax(
                    torch.softmax(pred["tp"], dim=-1), dim=-1, keepdim=True
                )
                pred["tp"] = tp.float()
            cat = torch.cat(list(pred.values()), -1).numpy()
            for j, p in enumerate(chunk):
                items.append((p, cat[j : j + 1]))

    type_colour = (
        {i: (f"t{i}", (255, 0, 0)) for i in range(nr_types)} if nr_types else None
    )
    image_info = {"src_shape": src_shape, "src_image": img.copy(), "name": "x"}
    _name, pred_map, pred_inst, inst_info, _overlaid = tile._post_process_patches(
        post.process,
        {"nr_types": nr_types, "return_centroids": True},
        items,
        image_info,
        {"draw_dot": False, "type_colour": type_colour, "line_thickness": 2},
    )
    return np.asarray(pred_map), np.asarray(pred_inst), inst_info


def _compare(ref_inst, ref_info, our_inst, our_info, nr_types,
             min_aji=0.99, match_iou=None):
    stats = _import_reference()["stats"]

    n_ref = int(ref_inst.max() and len(np.unique(ref_inst)) - 1)
    n_our = int(our_inst.max() and len(np.unique(our_inst)) - 1)
    assert n_ref >= 5, f"degenerate reference content ({n_ref} instances)"
    assert abs(n_our - n_ref) <= max(2, int(0.02 * n_ref)), (n_our, n_ref)

    a = stats.remap_label(ref_inst.astype(np.int64))
    b = stats.remap_label(our_inst.astype(np.int64))
    aji = stats.get_fast_aji(a, b)
    assert aji >= min_aji, f"cross-framework AJI {aji} < {min_aji}"

    if match_iou is not None:
        # structural agreement: every reference instance has a 1-1
        # counterpart; disagreement is boundary wobble only
        for i in np.unique(ref_inst):
            if i == 0:
                continue
            m = ref_inst == i
            vals, counts = np.unique(our_inst[m], return_counts=True)
            j = vals[np.argmax(counts)]
            assert j != 0, f"ref instance {i} unmatched"
            o = our_inst == j
            iou = (m & o).sum() / (m | o).sum()
            assert iou >= match_iou, f"ref instance {i}: IoU {iou}"

    if nr_types:
        ref_types = np.sort([v["type"] for v in ref_info.values()])
        our_types = np.sort([v["type"] for v in our_info.values()])
        ref_hist = np.bincount(ref_types, minlength=nr_types)
        our_hist = np.bincount(our_types, minlength=nr_types)
        assert np.abs(ref_hist - our_hist).sum() <= max(
            2, int(0.04 * n_ref)
        ), (ref_hist, our_hist)
    return aji


def _run_ours(tar_path, img, mode, nr_types, device_post_proc=True):
    import jax.numpy as jnp

    from hover_net_tpu.infer.tile import TileInferManager

    mgr = TileInferManager(
        model_path=str(tar_path),
        mode=mode,
        nr_types=nr_types,
        width=64,
        dtype=jnp.float32,
        batch_size=4,
        device_post_proc=device_post_proc,
    )
    pred_map, inst_map, inst_info = mgr.predict_image(img)
    return np.asarray(pred_map), inst_map, inst_info


@pytest.mark.parametrize(
    "mode,nr_types",
    [("fast", None), ("fast", 5), ("original", None), ("original", 5)],
)
def test_composed_pipeline_parity(mode, nr_types, tmp_path):
    net = _build_reference_model(mode, nr_types, seed=11)

    tar = tmp_path / "net_epoch=1.tar"
    state = {"module." + k: v for k, v in net.state_dict().items()}
    torch.save({"desc": state}, str(tar))

    patch_in, patch_out = (270, 80) if mode == "original" else (256, 164)
    # smallest non-trivial multi-patch grids (2x3): width-64 torch
    # forwards on the single-core CPU runner dominate this test's cost
    h, w = (160, 240) if mode == "original" else (328, 492)
    img = _synth_image(h, w, seed=3)

    ref_map, ref_inst, ref_info = _run_reference_composed(
        net, img, nr_types, patch_in, patch_out
    )
    our_map, our_inst, our_info = _run_ours(
        tar, img, mode, nr_types, device_post_proc=False
    )

    assert our_map.shape == ref_map.shape, (our_map.shape, ref_map.shape)
    # channel contract: [tp?, np fg prob, hv]; tp is an argmax (integer
    # stored as float, ties may differ), prob/hv are continuous
    ofs = 1 if nr_types else 0
    cont = np.abs(our_map[..., ofs:] - ref_map[..., ofs:]).max()
    assert cont < 5e-3, f"pred map drift {cont}"
    if nr_types:
        match = (our_map[..., 0] == ref_map[..., 0]).mean()
        assert match > 0.995, f"tp map agreement {match}"

    # host-oracle path: near-exact parity with the reference pipeline
    # (the only algorithmic freedom is watershed heap-order ties)
    _compare(ref_inst, ref_info, our_inst, our_info, nr_types,
             min_aji=0.99)

    # production device-post-proc path: the TPU watershed resolves
    # exact-energy ties canonically ((hops-since-ascent, marker
    # geodesic, label)) instead of by skimage's queue insertion order —
    # instance-level agreement with boundary-tie wobble only
    _, dev_inst, dev_info = _run_ours(
        tar, img, mode, nr_types, device_post_proc=True
    )
    # floor raised 0.93 -> 0.95 after the round-4 drift fix (masked
    # min-max stats + HIGHEST-precision Sobel): the round-5 50-tile
    # sweep measured min AJI 0.9598, p5 0.9624, count delta 0
    # (PARITY.md, scripts/parity_drift_sweep_r5_tpu.csv)
    _compare(ref_inst, ref_info, dev_inst, dev_info, nr_types,
             min_aji=0.95, match_iou=0.6)


_BENCH_CKPT = os.path.join(
    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
    "hover_net_tpu",
    "bench_w64_synth_v1.msgpack",
)


@pytest.mark.skipif(
    not os.path.exists(_BENCH_CKPT),
    reason="bench-trained width-64 checkpoint not cached (run bench.py once)",
)
def test_ref_e2e_parity_trained(tmp_path):
    """Realistic-content composition: the bench checkpoint (trained on
    synthetic nuclei) exported to the reference .tar format via
    save_torch_tar, then both full pipelines on a nuclei image."""
    import jax.numpy as jnp

    from hover_net_tpu.models.checkpoints import (
        HoVerNetConfig,
        load_checkpoint,
        save_torch_tar,
    )

    cfg = HoVerNetConfig(mode="fast", nr_types=None, width=64)
    variables, _ = load_checkpoint(_BENCH_CKPT)
    tar = tmp_path / "trained.tar"
    save_torch_tar(str(tar), variables, cfg)

    net = _build_reference_model("fast", None, seed=0)
    payload = torch.load(str(tar), map_location="cpu")
    state = {k[len("module."):]: v for k, v in payload["desc"].items()}
    net.load_state_dict(state)
    net.eval()

    img = _synth_image(328, 492, seed=42, n_nuclei=80)
    ref_map, ref_inst, ref_info = _run_reference_composed(
        net, img, None, 256, 164
    )
    our_map, our_inst, our_info = _run_ours(
        tar, img, "fast", None, device_post_proc=False
    )

    cont = np.abs(our_map - ref_map).max()
    assert cont < 5e-3, f"pred map drift {cont}"
    _compare(ref_inst, ref_info, our_inst, our_info, None, min_aji=0.99)

    _, dev_inst, dev_info = _run_ours(tar, img, "fast", None)
    # 0.95 floor: see the round-5 drift-sweep note above
    _compare(ref_inst, ref_info, dev_inst, dev_info, None, min_aji=0.95,
             match_iou=0.6)


@pytest.mark.skipif(
    not os.path.exists(_BENCH_CKPT),
    reason="bench-trained width-64 checkpoint not cached (run bench.py once)",
)
def test_wsi_vs_reference_single_shot(tmp_path):
    """WSI machinery vs a SINGLE-SHOT run of the reference pipeline over
    the whole pseudo-slide, two ways:

    - tile_shape covering the slide (one post-proc window, no seams):
      STRICT agreement — validates the WSI chunk grid, f16 pred-map
      round trip, window assembly and instance-table bookkeeping against
      the reference's one-piece result;
    - tiled (tile_shape < slide, 3-phase stitching): LOOSE agreement —
      per-window min-max normalisation (the reference WSI normalises
      per 2048-tile too, post_proc.py:49-67 applied per mmap window)
      legitimately shifts marginal markers, so only aggregate agreement
      is asserted.

    The single-shot reference run is made comparable by emulating the
    WSI pipeline's REFERENCE-FAITHFUL border semantics on its pred map:
    the (input-output)/2 unpredicted top-left band zeroed (the
    reference WSI's mmap is zero-initialised there, infer/wsi.py:64-88
    + 520-534), an f16 round trip (our pred-map dtype), and zero
    padding to the canonical 768 window. Nuclei are painted with their
    full extent inside the region where both pipelines see identical
    forward inputs ([100, 528)^2 — the last patch column/row's input
    reads beyond the slide as black, like OpenSlide, while the
    single-shot tile path reflect-pads).
    """
    import json

    import cv2
    import jax.numpy as jnp

    from hover_net_tpu.infer.wsi import WSIInferManager

    from hover_net_tpu.models.checkpoints import (
        HoVerNetConfig,
        load_checkpoint,
        save_torch_tar,
    )

    ref = _import_reference()
    stats = ref["stats"]

    # the bench-trained checkpoint: crisp, confident predictions, so
    # threshold-marginal normalisation effects don't swamp the
    # stitching comparison (the ridge-fitted untrained net's marginal
    # markers flip by the dozen under an f16 round trip)
    cfg = HoVerNetConfig(mode="fast", nr_types=None, width=64)
    variables, _ = load_checkpoint(_BENCH_CKPT)
    tar = tmp_path / "trained.tar"
    save_torch_tar(str(tar), variables, cfg)
    net = _build_reference_model_uncached("fast", None, seed=0)
    payload = torch.load(str(tar), map_location="cpu")
    net.load_state_dict(
        {k[len("module."):]: v for k, v in payload["desc"].items()}
    )
    net.eval()

    side = 656  # 4x4 patch grid at fast-mode 164 steps
    rng = np.random.default_rng(5)
    img = np.full((side, side, 3), 225, np.float32)
    img += rng.normal(0, 4, img.shape)
    yy, xx = np.mgrid[-12:13, -12:13]
    for _ in range(90):
        cy = int(rng.integers(100, 516))
        cx = int(rng.integers(100, 516))
        r = int(rng.integers(5, 11))
        m = (yy**2 + xx**2) <= r * r
        col = np.array([120, 70, 150]) + rng.normal(0, 10, 3)
        img[cy - 12 : cy + 13, cx - 12 : cx + 13][m] = col
    slide = np.clip(img, 0, 255).astype(np.uint8)

    ref_map, _ref_inst, _ = _run_reference_composed(
        net, slide, None, 256, 164, batch=4
    )
    # emulate the WSI's effective pred map (see docstring) and run the
    # reference's process() on it in ONE piece
    emu = ref_map.copy()
    emu[:46, :] = 0
    emu[:, :46] = 0
    emu = emu.astype(np.float16).astype(np.float32)
    emu_canon = np.zeros((768, 768, 3), np.float32)
    emu_canon[:side, :side] = emu
    _inst, ref_info = ref["post"].process(
        emu_canon, nr_types=None, return_centroids=True
    )
    ref_cents = np.array(
        [v["centroid"] for v in ref_info.values()]
    ).reshape(-1, 2)
    n_ref = len(ref_cents)
    assert n_ref >= 30, f"degenerate reference content ({n_ref})"

    in_dir = tmp_path / "wsi_in"
    mask_dir = tmp_path / "masks"
    os.makedirs(in_dir)
    os.makedirs(mask_dir)
    np.save(str(in_dir / "s.npy"), slide)
    cv2.imwrite(str(mask_dir / "s.png"),
                np.full((side // 10, side // 10), 255, np.uint8))

    def run_wsi(tile_shape, tag):
        mgr = WSIInferManager(
            model_path=str(tar), mode="fast", nr_types=None, width=64,
            batch_size=4, dtype=jnp.float32, chunk_shape=656,
            tile_shape=tile_shape, ambiguous_size=32, proc_mag=40,
            cache_path=str(tmp_path / f"cache_{tag}"),
        )
        out_dir = str(tmp_path / f"out_{tag}")
        os.makedirs(out_dir, exist_ok=True)
        mgr.process_wsi_list(str(in_dir), out_dir,
                             input_mask_dir=str(mask_dir))
        with open(f"{out_dir}/s.json") as f:
            payload = json.load(f)
        return np.array(
            [v["centroid"] for v in payload["nuc"].values()]
        ).reshape(-1, 2)

    # radius 6: watershed exact-tie wobble between touching nuclei can
    # shift a centroid a few px; 6 px still uniquely identifies a
    # nucleus (diameters 10-22 px) while catching seam drops/dupes
    # strict: one window covers the slide, no stitching seams
    ours = run_wsi(656, "one")
    assert abs(len(ours) - n_ref) <= max(2, int(0.05 * n_ref)), (
        len(ours), n_ref)
    paired, _, _ = stats.pair_coordinates(ref_cents, ours, 6)
    assert len(paired) >= 0.9 * n_ref, (len(paired), n_ref)

    # tiled: 3-phase stitching with per-window normalisation
    ours = run_wsi(328, "tiled")
    assert abs(len(ours) - n_ref) <= max(2, int(0.10 * n_ref)), (
        len(ours), n_ref)
    paired, _, _ = stats.pair_coordinates(ref_cents, ours, 6)
    assert len(paired) >= 0.9 * n_ref, (len(paired), n_ref)
