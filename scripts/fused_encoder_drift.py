"""Instance-level drift of the fused-block Pallas encoder vs the
standard XLA forward, with TRAINED weights.

The parity drift sweep (parity_drift_sweep.py) compares post-proc
paths on one shared forward output, so an encoder change cancels out
of it. This script isolates the encoder: the SAME tile runs through
BOTH forwards (standard XLA vs models/encoder_pallas.fused_forward),
each stitched map goes through the SAME production post-proc, and the
two instance maps are scored against each other (AJI + count delta).
The fused kernel folds BN into (scale, offset) pairs, whose bf16
rounding differs from flax's (x-mean)*rsqrt chain — this measures
what that does to actual segmentations.

Usage: python scripts/fused_encoder_drift.py [--n 20]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--size", type=int, default=1000)
    args = ap.parse_args()

    from hover_net_tpu import runtime

    runtime.setup()
    import jax
    import jax.numpy as jnp

    from bench import _E2E_CKPT, _train_e2e_checkpoint, synth_nuclei_image
    from hover_net_tpu.data.tiling import (bucket_grid_dim,
                                           prepare_tile_patching)
    from hover_net_tpu.infer.steps import extract_patches, infer_output
    from hover_net_tpu.metrics import remap_label
    from hover_net_tpu.metrics.stats import get_fast_aji
    from hover_net_tpu.models import HoVerNet, HoVerNetConfig
    from hover_net_tpu.models.checkpoints import load_checkpoint
    from hover_net_tpu.ops.post_proc_device import proc_np_hv_batch

    if not os.path.exists(_E2E_CKPT):
        print("# training sweep checkpoint...", file=sys.stderr)
        _train_e2e_checkpoint()

    cfg = HoVerNetConfig(mode="fast", nr_types=None, width=64,
                         dtype=jnp.bfloat16)
    model = HoVerNet(cfg)
    variables, _ = load_checkpoint(_E2E_CKPT)

    size = args.size
    win, step = cfg.patch_input_shape, cfg.patch_output_shape
    pads, _, grid = prepare_tile_patching((size, size), win, step)
    rows, cols = bucket_grid_dim(grid[0]), bucket_grid_dim(grid[1])
    ys = np.arange(0, rows * step, step, dtype=np.int32)
    xs = np.arange(0, cols * step, step, dtype=np.int32)
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    coords = jnp.asarray(np.stack([yy.ravel(), xx.ravel()], -1), jnp.int32)

    def make_run(allow_fused):
        @jax.jit
        def run(img):
            patches = extract_patches(img, coords, win)
            out = infer_output(model, variables, patches,
                               allow_fused_enc=allow_fused)
            h, w, ch = out.shape[1], out.shape[2], out.shape[3]
            full = out.reshape(rows, cols, h, w, ch)
            full = full.transpose(0, 2, 1, 3, 4).reshape(rows * h,
                                                         cols * w, ch)
            full = full[:size, :size]
            valid = jnp.ones((1, size, size), bool)
            inst = proc_np_hv_batch(full[None], valid)
            return inst[0], jnp.max(full[..., 0]) - jnp.min(full[..., 0])
        return run

    run_std, run_fus = make_run(False), make_run(True)

    rng = np.random.default_rng(5)
    ajis, dcounts = [], []
    for i in range(args.n):
        n_nuclei = int(rng.integers(200, 2400))
        img, _ = synth_nuclei_image(size, size,
                                    seed=int(rng.integers(1 << 30)),
                                    n_nuclei=n_nuclei)
        canvas = rows * step + (win - step)
        padded = np.zeros((canvas, canvas, 3), np.uint8)
        padded[:size, :size] = img
        dev = jnp.asarray(padded, jnp.float32)
        a, _ = run_std(dev)
        b, _ = run_fus(dev)
        a = remap_label(np.asarray(a))
        b = remap_label(np.asarray(b))
        na, nb = a.max(), b.max()
        aji = get_fast_aji(a, b) if na and nb else float(na == nb)
        ajis.append(aji)
        dcounts.append(abs(int(na) - int(nb)))
        print(f"# tile {i}: std {na} fused {nb} aji {aji:.4f}",
              file=sys.stderr)

    ajis = np.array(ajis)
    print(json.dumps({
        "n_tiles": args.n,
        "aji_mean": round(float(ajis.mean()), 4),
        "aji_min": round(float(ajis.min()), 4),
        "count_delta_max": int(max(dcounts)),
        "backend": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
