"""Decompose device-path post-proc drift: quantisation vs block seams.

The round-4 drift sweep (scripts/parity_drift_sweep.py) found the
production TPU path drifting to AJI ~0.75 vs the host oracle on the
densest synthetic tiles. Two deliberate deviations could each be the
source (PARITY.md 8/9):

  (a) watershed on quantised energy (65536 levels since round 3,
      ops/post_proc_device.py NUM_LEVELS) with order-independent
      minimax-path relaxation — tie/ordering semantics differ from the
      reference's sequential priority-flood; shared by the exact scan
      path AND the blocked kernel;
  (b) the blocked-VMEM kernel's halo bound — label propagation inside a
      CLUMP of touching nuclei can exceed the halo even when every
      individual instance is small (the seam guard only checks output
      instance extents, so this drift is silent).

This script re-runs selected sweep tiles (same rng protocol) through
ONE forward each, then post-processes the SAME stitched device map via:

  host   : ops/post_proc_host.proc_np_hv (reference algorithm)
  exact  : all-XLA scan path (quantised energy, no blocks)
  b384/64, b256/128: the blocked kernel at both geometries

and reports AJI of each device path vs host, plus blocked-vs-exact
(which isolates the seam contribution).

Usage: python scripts/drift_decompose.py [--tiles 0,8,12,22,25,43] [--n 50]
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
    ap.add_argument("--tiles", default="0,8,12,22,25,43")
    ap.add_argument("--n", type=int, default=50,
                    help="sweep length (rng stream must match)")
    ap.add_argument("--size", type=int, default=1000)
    args = ap.parse_args()
    want = sorted(int(v) for v in args.tiles.split(","))

    from hover_net_tpu import runtime

    runtime.setup()
    import jax
    import jax.numpy as jnp

    from bench import _E2E_CKPT, _train_e2e_checkpoint, synth_nuclei_image
    from hover_net_tpu.infer.tile import TileInferManager
    from hover_net_tpu.metrics import remap_label
    from hover_net_tpu.metrics.stats import get_fast_aji
    from hover_net_tpu.ops.post_proc_device import proc_np_hv_batch
    from hover_net_tpu.ops.post_proc_host import proc_np_hv
    from hover_net_tpu.ops.post_proc_pallas import proc_np_hv_blocked

    if not os.path.exists(_E2E_CKPT):
        print("# training sweep checkpoint...", file=sys.stderr)
        _train_e2e_checkpoint()

    mgr = TileInferManager(
        model_path=_E2E_CKPT, mode="fast", nr_types=None, width=64,
        batch_size=32, dtype=jnp.bfloat16,
    )

    use_blocked = jax.devices()[0].platform in ("tpu", "axon")

    @jax.jit
    def pp_exact(full, src):
        sh, sw = src[0], src[1]
        rr = jnp.arange(full.shape[0])
        cc = jnp.arange(full.shape[1])
        valid = (rr < sh)[:, None] & (cc < sw)[None, :]
        return proc_np_hv_batch(full[None, ..., 0:3], valid[None],
                                exact=True)[0]

    import functools

    @functools.partial(jax.jit, static_argnames=("core", "halo"))
    def pp_blocked(full, src, core, halo):
        sh, sw = src[0], src[1]
        rr = jnp.arange(full.shape[0])
        cc = jnp.arange(full.shape[1])
        valid = (rr < sh)[:, None] & (cc < sw)[None, :]
        return proc_np_hv_blocked(full[None, ..., 0:3], valid[None],
                                  core=core, halo=halo)[0]

    # replay the sweep's rng stream so tile k here is tile k there
    rng = np.random.default_rng(2024)
    specs = []
    for k in range(args.n):
        n_nuc = int(rng.integers(200, 2400))
        seed = int(rng.integers(1 << 30))
        if k in want:
            specs.append((k, n_nuc, seed))

    rows = []
    for k, n_nuc, seed in specs:
        img, _ = synth_nuclei_image(args.size, args.size, seed=seed,
                                    n_nuclei=n_nuc)
        h, w = img.shape[:2]
        out = mgr.predict_image_async(img)
        full = out[0]  # canonical, already reflect-101 mirrored
        src = jnp.asarray([h, w], jnp.int32)
        pred_map = np.asarray(full)[:h, :w].astype(np.float32)

        t0 = time.perf_counter()
        inst_host = remap_label(proc_np_hv(pred_map))
        t_host = time.perf_counter() - t0

        def crop(x):
            return remap_label(np.asarray(x)[:h, :w].astype(np.int32))

        res = {"exact": crop(pp_exact(full, src))}
        if use_blocked:
            res["b384/64"] = crop(pp_blocked(full, src, 384, 64))
            res["b256/128"] = crop(pp_blocked(full, src, 256, 128))

        def aji(a, b):
            if a.max() == 0 and b.max() == 0:
                return 1.0
            if a.max() == 0 or b.max() == 0:
                return 0.0
            return float(get_fast_aji(a, b))

        row = {"tile": k, "n_host": int(inst_host.max()),
               "t_host_s": round(t_host, 2)}
        for name, lab in res.items():
            row[f"n_{name}"] = int(lab.max())
            row[f"aji_{name}"] = round(aji(inst_host, lab), 4)
        if use_blocked:
            row["aji_b384_vs_exact"] = round(
                aji(res["exact"], res["b384/64"]), 4)
            row["aji_b256_vs_exact"] = round(
                aji(res["exact"], res["b256/128"]), 4)
        rows.append(row)
        print(json.dumps(row), flush=True)

    for key in [k for k in rows[0] if k.startswith("aji")]:
        vals = [r[key] for r in rows]
        print(f"# {key}: mean={np.mean(vals):.4f} min={np.min(vals):.4f}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
