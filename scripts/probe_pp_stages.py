"""Stage split of the blocked-VMEM post-proc kernel (lax.scan K-delta).

Builds kernel VARIANTS that skip one stage each (reusing the module's
in-kernel helpers) and reports cost(stage) = t(full) - t(without).
Locates where the ~78 ms/tile post-proc budget goes so optimisation
effort lands on the right fixpoint.

Usage: python scripts/probe_pp_stages.py [--size 1000]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from hover_net_tpu.ops import post_proc_pallas as ppp
    from hover_net_tpu.ops import filters
    from hover_net_tpu.ops.cc_np import ellipse_structuring_element
    from hover_net_tpu.ops.post_proc_device import blocked_geom, NUM_LEVELS
    from bench import synth_pred_map

    # canonical canvas for --size source tiles
    from hover_net_tpu.data.tiling import bucket_grid_dim, prepare_tile_patching
    win, step = 256, 164
    _, _, grid = prepare_tile_patching((args.size, args.size), win, step)
    rows = bucket_grid_dim(grid[0])
    h = w = rows * step
    core, halo = blocked_geom(h, w)
    print(f"# map {h}^2, geom {core}/{halo}")

    pred = jnp.asarray(synth_pred_map(h, w)[None]).astype(jnp.float32)
    valid = jnp.zeros((1, h, w), bool).at[:, :args.size, :args.size].set(True)

    blb0 = (pred[..., 0] >= 0.5) & valid
    h_dir = filters.minmax_norm(pred[..., 1], where=valid)
    v_dir = filters.minmax_norm(pred[..., 2], where=valid)
    sobelh = 1.0 - filters.minmax_norm(filters.sobel_h(h_dir, 21),
                                       where=valid)
    sobelv = 1.0 - filters.minmax_norm(filters.sobel_v(v_dir, 21),
                                       where=valid)
    sob = jnp.maximum(sobelh, sobelv)
    blb0 = jax.device_put(blb0)
    sob = jax.device_put(sob)

    selem = ellipse_structuring_element(5, 5)
    selem_total = int(selem.sum())
    wsz = core + 2 * halo

    def make_variant(skip):
        """skip in {none, rmsmall, fill, open, ws, ws_phase2}."""

        def kernel(blb_hbm, sob_hbm, out_ref):
            bi = pl.program_id(0)
            by = pl.program_id(1)
            bx = pl.program_id(2)
            oy = by * core
            ox = bx * core
            padded_w = out_ref.shape  # placeholder (unused)

            def run(blb_v, sob_v, sem):
                c1 = pltpu.make_async_copy(
                    blb_hbm.at[bi, pl.ds(oy, wsz), pl.ds(ox, wsz)], blb_v,
                    sem.at[0])
                c2 = pltpu.make_async_copy(
                    sob_hbm.at[bi, pl.ds(oy, wsz), pl.ds(ox, wsz)], sob_v,
                    sem.at[1])
                c1.start()
                c2.start()
                c1.wait()
                c2.wait()
                blb_raw = blb_v[:]
                sobv = sob_v[:]

                gy = jax.lax.broadcasted_iota(jnp.int32, (wsz, wsz), 0) + oy
                gx = jax.lax.broadcasted_iota(jnp.int32, (wsz, wsz), 1) + ox
                idx = gy * (pw) + gx + 1
                in_img = ((gy >= halo) & (gy < halo + h)
                          & (gx >= halo) & (gx < halo + w)).astype(jnp.int32)

                blb_lab = ppp._ccl_fixpoint(blb_raw, idx, wsz)
                if skip != "rmsmall":
                    blb_lab = ppp._remove_small(blb_lab, 10)
                blb = (blb_lab > 0).astype(jnp.int32)
                blb_f = blb.astype(jnp.float32)

                overall = jnp.maximum(sobv - (1.0 - blb_f), 0.0)
                dist = (1.0 - overall) * blb_f
                k = jnp.float32(0.25)
                row = (ppp._shift(dist, 1, 0, 0.0)
                       + ppp._shift(dist, -1, 0, 0.0) + 2.0 * dist) * k
                dist = (ppp._shift(row, 1, 1, 0.0)
                        + ppp._shift(row, -1, 1, 0.0) + 2.0 * row) * k
                dist = -dist
                energy_q = jnp.round(
                    (dist + 1.0) * (NUM_LEVELS - 1)).astype(jnp.int32)

                marker = blb * (1 - (overall >= 0.4).astype(jnp.int32))
                if skip != "fill":
                    marker = ppp._fill_holes(marker, wsz)
                if skip != "open":
                    er = (ppp._selem_count(marker | (1 - in_img), selem,
                                           fill=1)
                          >= selem_total).astype(jnp.int32) * in_img
                    marker = (ppp._selem_count(er, selem, fill=0) > 0) \
                        .astype(jnp.int32) * in_img
                mk_lab = ppp._ccl_fixpoint(marker, idx, wsz)
                if skip != "rmsmall":
                    mk_lab = ppp._remove_small(mk_lab, 10)

                if skip == "ws":
                    lab = mk_lab
                elif skip == "ws_phase2":
                    seeded = (mk_lab > 0) & (blb > 0)
                    lab0 = jnp.where(seeded, mk_lab, 0)
                    esh = energy_q << ppp.HOP_BITS
                    cost0 = jnp.where(seeded, esh, ppp.INT_MAX)

                    def cost_body(state):
                        cost, _ = state
                        nc = ppp._ws_cost_sweep(cost, esh, blb)
                        return nc, jnp.any(nc != cost)

                    cost, _ = jax.lax.while_loop(
                        lambda s: s[1], cost_body, (cost0, jnp.bool_(True)))
                    lab = jnp.where((cost != ppp.INT_MAX) & (blb > 0),
                                    lab0 + (cost & 0xFF), 0)
                else:
                    lab = ppp._watershed(energy_q, mk_lab, blb, wsz)
                out_ref[0] = lab[halo: halo + core, halo: halo + core]

            pl.run_scoped(
                run,
                blb_v=pltpu.VMEM((wsz, wsz), jnp.int32),
                sob_v=pltpu.VMEM((wsz, wsz), jnp.float32),
                sem=pltpu.SemaphoreType.DMA((2,)),
            )

        nby = -(-h // core)
        nbx = -(-w // core)
        ph = nby * core + 2 * halo
        global pw
        pw = nbx * core + 2 * halo

        @jax.jit
        def runf(blb_in, sob_in):
            def pad(x, fill):
                return jnp.pad(
                    x, ((0, 0), (halo, ph - halo - h),
                        (halo, pw - halo - w)), constant_values=fill)

            bp = pad(blb_in.astype(jnp.int32), 0)
            sp = pad(sob_in.astype(jnp.float32), 0.0)
            return pl.pallas_call(
                kernel,
                grid=(1, nby, nbx),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                          pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec((1, core, core),
                                       lambda i, j, k: (i, j, k),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(
                    (1, nby * core, nbx * core), jnp.int32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=120 * 1024 * 1024),
            )(bp, sp)

        return runf

    results = {}
    for skip in ("none", "ws", "ws_phase2", "rmsmall", "fill", "open"):
        runf = make_variant(skip)

        def body(c, runf=runf):
            lab = runf(c, sob)
            s = (jnp.sum(lab) % 997).astype(jnp.float32) * 1e-20
            return jnp.logical_xor(c, s > 1e30), s

        t0 = time.perf_counter()
        ms = probe(body, blb0)
        results[skip] = ms
        print(f"variant[{skip}]: {ms:.1f} ms  "
              f"({time.perf_counter()-t0:.0f}s)", flush=True)

    full = results["none"]
    print(f"-- watershed total:   {full - results['ws']:.1f} ms")
    print(f"-- ws phase2 (ties):  {results['ws_phase2'] - results['ws']:.1f}"
          " ms  (phase1 = watershed total - this)")
    print(f"-- remove_small (2x): {full - results['rmsmall']:.1f} ms")
    print(f"-- fill_holes:        {full - results['fill']:.1f} ms")
    print(f"-- 5x5 opening:       {full - results['open']:.1f} ms")
    print(f"full kernel:          {full:.1f} ms")


if __name__ == "__main__":
    main()
