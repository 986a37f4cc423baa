"""Seam-guard worst-case cost on a degenerate prediction.

The blocked post-proc kernel's seam guard re-solves a window through the
exact scan path when an instance's extent exceeds the halo bound
(infer/wsi.py finalize). Normal slides trip it never-to-rarely; a
DEGENERATE prediction (giant merged blobs spanning many windows) trips
it on every window, and after `_SEAM_REFINE_CAP` trips the manager
escalates to the exact path directly. This harness times the 3-phase
WSI post-processing on

  (a) a nuclei-like pred map (guard never trips), and
  (b) an adversarial map of ~600 px blobs tiling the slide (every
      window trips; escalation kicks in after the cap),

and reports the slowdown factor — the number VERDICT r3 item 8 asked
for. Inference is skipped (the pred map is synthesized directly); this
isolates the post-proc phases the guard lives in.

    python scripts/bench_seam_guard.py [--size 4096]
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


def blob_pred(n, blob=600, gap=80):
    """Giant square blobs tiling the slide — every post-proc window
    contains several instances whose extent (>> halo bound) forces the
    blocked kernel to fragment them and the guard to flag the window."""
    from hover_net_tpu.ops.targets import gen_instance_hv_map

    inst = np.zeros((n, n), np.int32)
    k = 1
    for y in range(gap, n - blob, blob + gap):
        for x in range(gap, n - blob, blob + gap):
            inst[y : y + blob, x : x + blob] = k
            k += 1
    hv = gen_instance_hv_map(inst, inst.shape)
    return np.dstack([(inst > 0).astype(np.float32),
                      hv[..., 0], hv[..., 1]]).astype(np.float32)


def nuclei_pred(n):
    import bench

    return bench.synth_pred_map(n, n, n_nuclei=n * n // 850, seed=3)


def run_phases(pred, workdir, tag):
    from hover_net_tpu.data.tiling import wsi_tile_grids
    from hover_net_tpu.infer.wsi import WSIInferManager

    n = pred.shape[0]
    mgr = WSIInferManager.__new__(WSIInferManager)
    mgr.nr_types = None
    mgr.n_devices = 1
    mgr.tile_shape = 2048
    mgr.ambiguous_size = 128
    mgr.wsi_proc_shape = np.array([n, n])
    mgr.wsi_mask = np.ones((n // 64, n // 64), np.uint8)
    mgr.wsi_inst_info = {}
    mgr.wsi_inst_map = np.zeros((n, n), np.int32)
    mgr._pred_map_path = os.path.join(workdir, f"pred_{tag}.npy")
    np.save(mgr._pred_map_path, pred)
    tg, tb, tc = wsi_tile_grids(np.array([n, n]),
                                np.array([2048, 2048]), 128)
    # warm the compiled window programs so (a) and (b) time execution,
    # not compilation
    mgr._dispatch_post_processing(tg[:1], lambda *a: None, "warmup")
    mgr.wsi_inst_info = {}
    mgr.wsi_inst_map[:] = 0
    mgr._seam_refines = 0
    mgr._force_exact = False
    t0 = time.perf_counter()
    mgr._dispatch_post_processing(tg, mgr._cb_normal_tile, f"{tag} p1")
    mgr._dispatch_post_processing(tb, mgr._cb_fixing_tile, f"{tag} p2")
    mgr._dispatch_post_processing(tc, mgr._cb_fixing_tile, f"{tag} p3")
    dt = time.perf_counter() - t0
    return dt, mgr._seam_refines, mgr._force_exact, len(mgr.wsi_inst_info)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--workdir", default="/tmp/hnt_seam_bench")
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)

    t_norm, r_norm, esc_norm, n_norm = run_phases(
        nuclei_pred(args.size), args.workdir, "nuclei")
    t_adv, r_adv, esc_adv, n_adv = run_phases(
        blob_pred(args.size), args.workdir, "blobs")
    print(json.dumps({
        "metric": "seam_guard_worst_case_slowdown",
        "value": round(t_adv / t_norm, 2), "unit": "x",
        "size": args.size,
        "normal_s": round(t_norm, 2), "normal_refines": r_norm,
        "normal_instances": n_norm,
        "adversarial_s": round(t_adv, 2), "adversarial_refines": r_adv,
        "adversarial_escalated": esc_adv,
        "adversarial_instances": n_adv,
    }))


if __name__ == "__main__":
    main()
