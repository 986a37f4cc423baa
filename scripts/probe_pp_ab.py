"""A/B isolation probe for the blocked post-proc kernel's device time.

Round-5 found the standalone kernel reading ~369 ms/tile on
synth_pred_map content where round 4 recorded 88.1 ms — but round 4
measured at window geometry 256/128 (b944764), and the default moved
to 384/64 (ca4a564) on FUSED-program evidence only. The round-5 drift
fix (4427908) also changed the kernel's input values (valid-masked
min-max normalisation). This probe separates the two variables in ONE
process (shared compile cache):

  masked_384_64    HEAD defaults (what probe_device_time reads)
  masked_256_128   HEAD prep, round-4's geometry
  unmasked_384_64  pre-fix prep, HEAD geometry
  unmasked_256_128 full round-4 config (should reproduce ~88 ms)

Usage: python scripts/probe_pp_ab.py [--size 1000]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from probe_device_time import probe  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1000)
    args = ap.parse_args()

    from hover_net_tpu import runtime

    runtime.setup()
    import jax
    import jax.numpy as jnp

    from hover_net_tpu.data.tiling import bucket_grid_dim, prepare_tile_patching
    from hover_net_tpu.ops import filters
    from hover_net_tpu.ops.post_proc_pallas import proc_tail_blocked
    from bench import synth_pred_map

    size = args.size
    win, step = 256, 164
    _, _, grid = prepare_tile_patching((size, size), win, step)
    rows = bucket_grid_dim(grid[0])
    h = w = rows * step
    print(f"# map {h}^2")

    pred = jnp.asarray(synth_pred_map(h, w)[None]).astype(jnp.float32)
    valid = jnp.zeros((1, h, w), bool).at[:, :size, :size].set(True)
    blb = (pred[..., 0] >= 0.5) & valid

    def sob_of(where):
        h_dir = filters.minmax_norm(pred[..., 1], where=where)
        v_dir = filters.minmax_norm(pred[..., 2], where=where)
        sobelh = 1.0 - filters.minmax_norm(filters.sobel_h(h_dir, 21),
                                           where=where)
        sobelv = 1.0 - filters.minmax_norm(filters.sobel_v(v_dir, 21),
                                           where=where)
        return jnp.maximum(sobelh, sobelv)

    sob_masked = jax.device_put(sob_of(valid))
    sob_plain = jax.device_put(sob_of(None))
    blb = jax.device_put(blb)

    variants = [
        ("masked_384_64", sob_masked, 384, 64),
        ("masked_256_128", sob_masked, 256, 128),
        ("unmasked_384_64", sob_plain, 384, 64),
        ("unmasked_256_128", sob_plain, 256, 128),
    ]
    for name, sob, core, halo in variants:
        def body(c, sob=sob, core=core, halo=halo):
            inst = proc_tail_blocked(blb, c, core=core, halo=halo)
            s = (jnp.sum(inst) % 1000).astype(jnp.float32) * 1e-20
            return c + s, s

        ms = probe(body, sob, k_lo=2, k_hi=6)
        print(f"{name}: {ms:.1f} ms/tile")


if __name__ == "__main__":
    main()
