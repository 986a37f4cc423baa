"""Device-path post-proc drift distribution vs the host oracle.

VERDICT r3 item 5: the composed parity test accepts the production
device post-proc at AJI >= 0.93 vs the reference pipeline — a floor,
not an estimate. This sweep quantifies the actual drift: N
trained-checkpoint tiles are run through ONE forward each, then the
stitched prediction map is post-processed twice —

  (a) host oracle (ops/post_proc_host.proc_np_hv — algorithmically the
      reference pipeline, models/hovernet/post_proc.py:26-90), and
  (b) the production device path (blocked Pallas kernel on TPU /
      scan path elsewhere — whatever proc_np_hv_batch dispatches),

and the per-tile AJI + instance-count delta between the two is
reported as a distribution (mean/p5/min). Differences are confined to
exact-tie watershed boundary pixels (PARITY.md deviations 8/9); this
script turns the 0.93 test floor into a measured estimate.

Usage: python scripts/parity_drift_sweep.py [--n 50] [--size 1000]
Writes a JSON summary to stdout and a per-tile CSV next to it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50)
    ap.add_argument("--size", type=int, default=1000)
    ap.add_argument("--csv", default="/tmp/parity_drift_sweep.csv")
    args = ap.parse_args()

    from hover_net_tpu import runtime

    runtime.setup()
    import jax.numpy as jnp

    from bench import _E2E_CKPT, _train_e2e_checkpoint, synth_nuclei_image
    from hover_net_tpu.infer.tile import TileInferManager
    from hover_net_tpu.metrics import remap_label
    from hover_net_tpu.metrics.stats import get_fast_aji
    from hover_net_tpu.ops.post_proc_host import proc_np_hv

    if not os.path.exists(_E2E_CKPT):
        print("# training sweep checkpoint (first run on this machine)...",
              file=sys.stderr)
        _train_e2e_checkpoint()

    mgr = TileInferManager(
        model_path=_E2E_CKPT, mode="fast", nr_types=None, width=64,
        batch_size=32, dtype=jnp.bfloat16,
    )

    rng = np.random.default_rng(2024)
    rows = []
    t0 = time.perf_counter()
    for k in range(args.n):
        # vary content density/size so the sweep covers sparse and
        # crowded tiles (crowding is where tie boundaries matter)
        n_nuc = int(rng.integers(200, 2400))
        img, _ = synth_nuclei_image(args.size, args.size,
                                    seed=int(rng.integers(1 << 30)),
                                    n_nuclei=n_nuc)
        dev_out = mgr.predict_image_async(img)
        pred_map, inst_dev, _info = mgr.finalize_prediction(img, dev_out)
        # host oracle on the SAME prediction map
        inst_host = remap_label(proc_np_hv(pred_map))
        inst_dev = remap_label(np.asarray(inst_dev))
        n_h, n_d = int(inst_host.max()), int(inst_dev.max())
        if n_h == 0 and n_d == 0:
            aji = 1.0
        elif n_h == 0 or n_d == 0:
            aji = 0.0
        else:
            aji = float(get_fast_aji(inst_host, inst_dev))
        rows.append((k, n_nuc, n_h, n_d, aji))
        print(f"# tile {k}: nuclei={n_h} vs {n_d}, AJI={aji:.4f} "
              f"({time.perf_counter() - t0:.0f}s)", file=sys.stderr)

    ajis = np.array([r[4] for r in rows])
    dcounts = np.array([abs(r[3] - r[2]) for r in rows])
    rel = np.array([abs(r[3] - r[2]) / max(r[2], 1) for r in rows])
    summary = {
        "n_tiles": args.n,
        "tile_size": args.size,
        "aji_mean": round(float(ajis.mean()), 4),
        "aji_p5": round(float(np.percentile(ajis, 5)), 4),
        "aji_min": round(float(ajis.min()), 4),
        "count_delta_mean": round(float(dcounts.mean()), 3),
        "count_delta_max": int(dcounts.max()),
        "count_rel_delta_max": round(float(rel.max()), 5),
        "backend": mgr.devices[0].platform,
    }
    with open(args.csv, "w") as f:
        f.write("tile,n_painted,n_host,n_device,aji\n")
        for r in rows:
            f.write(",".join(str(v) for v in r) + "\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
