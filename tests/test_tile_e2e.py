"""End-to-end tile inference on synthetic images (contract test).

Uses a width-8 random-weight model: verifies plumbing (device patching,
stitched maps, device post-proc, writers) and the output contract —
mat/json/overlay files with the reference's keys — not biological
accuracy (covered by the synthetic post-proc tests).
"""

import json
import os

import numpy as np
import pytest
import scipy.io as sio

import jax

from hover_net_tpu.infer.steps import assemble_grid, extract_patches
from hover_net_tpu.models import HoVerNet, HoVerNetConfig
from hover_net_tpu.models.checkpoints import save_checkpoint


def test_extract_assemble_roundtrip():
    """Patch gather + grid stitch reconstructs the source (window==step)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (64, 48, 3)).astype(np.float32)
    coords = np.array([[y, x] for y in (0, 32) for x in (0, 16, 32)], np.int32)
    patches = extract_patches(jnp.asarray(img), jnp.asarray(coords), 16)
    assert patches.shape == (6, 16, 16, 3)
    np.testing.assert_array_equal(np.asarray(patches[0]), img[:16, :16])
    grid = assemble_grid(
        extract_patches(
            jnp.asarray(img),
            jnp.asarray([[y, x] for y in (0, 16, 32, 48) for x in (0, 16, 32)], np.int32),
            16,
        ),
        (4, 3),
    )
    np.testing.assert_array_equal(np.asarray(grid), img)


@pytest.fixture(scope="module")
def tiny_checkpoint(tmp_path_factory):
    cfg = HoVerNetConfig(mode="fast", nr_types=5, width=8)
    model = HoVerNet(cfg)
    import jax.numpy as jnp

    dummy = jnp.zeros((1, 256, 256, 3), jnp.float32)
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), dummy, train=False))()
    path = str(tmp_path_factory.mktemp("ckpt") / "tiny.msgpack")
    save_checkpoint(path, variables, extra={"mode": "fast", "nr_types": 5})
    return path


def synth_image(rng, shape=(200, 220)):
    img = np.full(shape + (3,), 230, np.uint8)
    for _ in range(6):
        cy, cx = rng.integers(20, shape[0] - 20), rng.integers(20, shape[1] - 20)
        cv2_circle(img, (cx, cy), int(rng.integers(6, 12)), (120, 60, 140))
    return img


def cv2_circle(img, center, r, color):
    import cv2

    cv2.circle(img, center, r, color, -1)


def test_tile_pipeline_contract(tiny_checkpoint, tmp_path):
    import cv2
    import jax.numpy as jnp

    from hover_net_tpu.infer.tile import TileInferManager

    rng = np.random.default_rng(1)
    in_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    os.makedirs(in_dir)
    for i in range(2):
        img = synth_image(rng)
        cv2.imwrite(str(in_dir / f"img{i}.png"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))

    mgr = TileInferManager(
        model_path=tiny_checkpoint, mode="fast", nr_types=5, width=8,
        batch_size=4, dtype=jnp.float32,
    )
    mgr.process_file_list(str(in_dir), str(out_dir), save_qupath=True,
                          save_raw_map=True)

    for i in range(2):
        mat = sio.loadmat(str(out_dir / "mat" / f"img{i}.mat"))
        assert mat["inst_map"].shape == (200, 220)
        assert mat["raw_map"].shape == (200, 220, 4)
        n = mat["inst_uid"].shape[0]
        assert mat["inst_centroid"].shape[0] == n
        assert mat["inst_type"].shape[0] == n
        with open(out_dir / "json" / f"img{i}.json") as f:
            payload = json.load(f)
        assert set(payload) == {"mag", "nuc"}
        assert len(payload["nuc"]) == n
        for info in payload["nuc"].values():
            assert set(info) == {"bbox", "centroid", "contour", "type", "type_prob"}
        assert (out_dir / "overlay" / f"img{i}.png").exists()
        # inst ids contiguous 1..n
        ids = np.unique(mat["inst_map"])
        assert ids.max() == n and len(ids) == n + 1 if n else ids.max() == 0


def test_tile_json_only_mode(tiny_checkpoint, tmp_path):
    """--save_format json: only json/(+qupath) written, no dense-map
    pull, and the json payload is byte-identical to the 'all' run's."""
    import cv2
    import jax.numpy as jnp

    from hover_net_tpu.infer.tile import TileInferManager

    rng = np.random.default_rng(2)
    in_dir = tmp_path / "in"
    os.makedirs(in_dir)
    img = synth_image(rng)
    cv2.imwrite(str(in_dir / "img0.png"),
                cv2.cvtColor(img, cv2.COLOR_RGB2BGR))

    mgr = TileInferManager(
        model_path=tiny_checkpoint, mode="fast", nr_types=5, width=8,
        batch_size=4, dtype=jnp.float32,
    )
    out_all = tmp_path / "out_all"
    out_json = tmp_path / "out_json"
    mgr.process_file_list(str(in_dir), str(out_all), save_qupath=True)
    mgr.process_file_list(str(in_dir), str(out_json), save_qupath=True,
                          save_format="json")

    assert (out_json / "json" / "img0.json").exists()
    assert (out_json / "qupath" / "img0.tsv").exists()
    assert not (out_json / "mat").exists()
    assert not (out_json / "overlay").exists()
    assert (out_json / "json" / "img0.json").read_bytes() == \
        (out_all / "json" / "img0.json").read_bytes()
    assert (out_json / "qupath" / "img0.tsv").read_bytes() == \
        (out_all / "qupath" / "img0.tsv").read_bytes()


@pytest.mark.slow
def test_canonical_grid_one_program_for_mixed_sizes(tiny_checkpoint, tmp_path):
    """A directory of heterogeneous image sizes (same canonical grid
    class) must compile exactly one pipeline, and instance maps must
    match the exact-shape (static src_hw) pipeline."""
    import jax.numpy as jnp

    from hover_net_tpu.data.tiling import bucket_grid_dim, prepare_tile_patching
    from hover_net_tpu.infer.steps import make_tile_pipeline
    from hover_net_tpu.infer.tile import TileInferManager
    from hover_net_tpu.metrics import get_fast_aji, remap_label

    assert [bucket_grid_dim(n) for n in (1, 7, 8, 9, 13, 17, 33)] == \
        [1, 7, 8, 10, 14, 20, 40]

    rng = np.random.default_rng(4)
    mgr = TileInferManager(
        model_path=tiny_checkpoint, mode="fast", nr_types=5, width=8,
        batch_size=4, dtype=jnp.float32,
    )
    sizes = [(180, 200), (200, 220), (170, 230), (214, 190)]
    outs = []
    for shape in sizes:
        img = synth_image(rng, shape)
        outs.append((img, mgr.finalize_prediction(
            img, mgr.predict_image_async(img))))
    # all four sizes share one canonical grid class -> one program
    assert len(mgr._pipelines) == 1

    # parity vs the exact-shape pipeline on the same inputs
    win, step = mgr.patch_input_shape, mgr.patch_output_shape
    for img, (pred_map, inst_map, info) in outs:
        src = img.shape[:2]
        pads, coords, grid = prepare_tile_patching(src, win, step)
        padded = np.pad(img, ((pads[0], pads[1]), (pads[2], pads[3]), (0, 0)),
                        mode="reflect")
        run = make_tile_pipeline(mgr.model, grid, src, batch=4)
        f2, i2, _nlab, _, _tables = run(mgr.variables, jnp.asarray(padded),
                        jnp.asarray(coords, jnp.int32))
        np.testing.assert_allclose(pred_map, np.asarray(f2), atol=1e-5)
        a = remap_label(inst_map)
        b = remap_label(np.asarray(i2))
        if b.max() and a.max():
            assert get_fast_aji(b, a) > 0.98
        else:
            assert a.max() == b.max() == 0
