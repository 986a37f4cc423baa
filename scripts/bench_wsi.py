"""Single-chip WSI throughput on a synthetic pseudo-slide.

Paints an H&E-like slide with disk nuclei, runs the full WSI pipeline
(chunk inference -> 3-phase boundary-consistent post-proc -> JSON) and
reports Mpx/s plus the per-stage log lines.

    python scripts/bench_wsi.py [--size 8000] [--workdir /tmp/hnt_wsi]

The forward uses the same cached width-64 synthetic-nuclei checkpoint
as bench.py's `e2e_real_content` (trained on first use).
"""

import argparse
import json
import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hover_net_tpu import runtime  # noqa: E402

runtime.setup()

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from hover_net_tpu.infer.wsi import WSIInferManager  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=8000)
    ap.add_argument("--workdir", default="/tmp/hnt_wsi")
    ap.add_argument("--n_devices", type=int, default=1)
    ap.add_argument("--chunk_shape", type=int, default=4096)
    ap.add_argument("--hbm_pred_budget", type=int, default=4 << 30,
                    help="bytes of HBM for the resident pred map; "
                    "0 forces the mmap (over-HBM) path")
    ap.add_argument("--force_striped", action="store_true",
                    help="run the mesh-striped resident-buffer code "
                    "path even at n_devices=1 (prices the striping "
                    "machinery against the plain single-chip programs)")
    args = ap.parse_args()

    n = args.size
    slide_dir = f"{args.workdir}/in"
    mask_dir = f"{args.workdir}/mask"
    out_dir = f"{args.workdir}/out"
    os.makedirs(slide_dir, exist_ok=True)
    os.makedirs(mask_dir, exist_ok=True)
    slide_path = f"{slide_dir}/slide.npy"
    if not os.path.exists(slide_path):
        print("painting slide...", flush=True)
        img, _ = bench.synth_nuclei_image(n, n, seed=7,
                                          n_nuclei=n * n // 850)
        np.save(slide_path, img)
        import cv2

        cv2.imwrite(f"{mask_dir}/slide.png",
                    np.full((n // 64, n // 64), 255, np.uint8))
    if not os.path.exists(bench._E2E_CKPT):
        print("training bench checkpoint (first run)...", flush=True)
        bench._train_e2e_checkpoint()

    mgr = WSIInferManager(
        model_path=bench._E2E_CKPT, mode="fast", nr_types=None, width=64,
        batch_size=32, dtype=jnp.bfloat16,
        chunk_shape=args.chunk_shape, tile_shape=2048, ambiguous_size=128,
        proc_mag=40, cache_path=f"{args.workdir}/cache",
        n_devices=args.n_devices,
        hbm_pred_budget=args.hbm_pred_budget,
        force_mesh=args.force_striped,
    )
    for f in (f"{out_dir}/slide.json",):
        if os.path.exists(f):
            os.remove(f)  # force a fresh run (resume would skip)
    t0 = time.perf_counter()
    mgr.process_wsi_list(slide_dir, out_dir, input_mask_dir=mask_dir)
    dt = time.perf_counter() - t0

    with open(f"{out_dir}/slide.json") as f:
        nuc = json.load(f)["nuc"]
    mpx = n * n / 1e6
    print(json.dumps({
        "metric": "wsi_mpx_per_sec_per_chip",
        "value": round(mpx / dt, 4), "unit": "Mpx/s",
        "wall_s": round(dt, 1), "n_nuclei": len(nuc),
        "path": ("striped" if args.force_striped or args.n_devices > 1
                 else "mmap" if args.hbm_pred_budget == 0 else "auto"),
    }))


if __name__ == "__main__":
    main()
