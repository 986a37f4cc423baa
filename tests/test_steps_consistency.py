"""Fused tile pipeline == staged (gather/forward/stitch/post-proc) path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hover_net_tpu.data.tiling import prepare_tile_patching
from hover_net_tpu.infer.steps import (
    assemble_grid,
    extract_patches,
    infer_output,
    make_tile_pipeline,
)
from hover_net_tpu.models import HoVerNet, HoVerNetConfig
from hover_net_tpu.ops.post_proc_device import proc_np_hv_batch


@pytest.mark.slow
def test_fused_pipeline_matches_staged():
    cfg = HoVerNetConfig(mode="fast", nr_types=5, width=8)
    model = HoVerNet(cfg)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)), train=False
    ))()

    rng = np.random.default_rng(0)
    src_h, src_w = 180, 200
    img = rng.integers(0, 255, (src_h, src_w, 3), dtype=np.uint8)
    win, step = cfg.patch_input_shape, cfg.patch_output_shape
    pads, coords, grid = prepare_tile_patching((src_h, src_w), win, step)
    padded = np.pad(img, ((pads[0], pads[1]), (pads[2], pads[3]), (0, 0)),
                    mode="reflect")
    dev_img = jnp.asarray(padded)
    dev_coords = jnp.asarray(coords, jnp.int32)

    # fused (what TileInferManager uses), with sub-batching enabled
    run = make_tile_pipeline(model, grid, (src_h, src_w), batch=3)
    full_f, inst_f, _nlab, tp_f, _tables = run(variables, dev_img, dev_coords)

    # staged
    patches = extract_patches(dev_img, dev_coords, win)
    out = infer_output(model, variables, patches)
    full_s = assemble_grid(out, grid)
    valid = jnp.zeros(full_s.shape[:2], bool).at[:src_h, :src_w].set(True)
    inst_s = proc_np_hv_batch(full_s[..., 1:4][None], valid[None])[0]

    # the fused path sub-batches the forward (lax.map) — float
    # accumulation differs at the 1e-3 level, so compare semantically
    np.testing.assert_allclose(
        np.asarray(full_f), np.asarray(full_s[:src_h, :src_w]),
        rtol=1e-2, atol=5e-3,
    )
    inst_agree = np.mean(
        (np.asarray(inst_f) > 0) == (np.asarray(inst_s[:src_h, :src_w]) > 0)
    )
    assert inst_agree > 0.999, inst_agree
    tp_agree = np.mean(
        np.asarray(tp_f) == np.asarray(full_s[:src_h, :src_w, 0].astype(jnp.int32))
    )
    assert tp_agree > 0.99, tp_agree
