"""Tunnel-insensitive device-time probe for the tile pipeline stages.

Methodology: each stage is wrapped in a lax.scan that runs it K times
inside ONE compiled dispatch, with an optimization_barrier'd data
dependence between iterations (so XLA cannot hoist the body out of the
loop). Wall-clocking t(K_hi) - t(K_lo) cancels dispatch latency, the
host->device transfer, and host CPU contention — only device execution
time remains. This is the readout VERDICT r3 asked for: cross-round
perf comparisons that tunnel weather cannot pollute.

Usage: python scripts/probe_device_time.py [--size 1000] [--stages all]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe(make_body, x, k_lo=2, k_hi=12, reps=3):
    """Device ms per iteration of make_body's stage.

    make_body(carry) must return (new_carry, small_output) where
    new_carry has a genuine data dependence on the stage output.
    """
    import jax
    import jax.numpy as jnp

    def run_k(k):
        @jax.jit
        def f(c):
            def body(c, _):
                c2, y = make_body(c)
                return jax.lax.optimization_barrier(c2), y
            c, ys = jax.lax.scan(body, c, None, length=k)
            return jax.tree_util.tree_map(jnp.sum, ys)

        return f

    f_lo, f_hi = run_k(k_lo), run_k(k_hi)
    # compile both
    jax.block_until_ready(f_lo(x))
    jax.block_until_ready(f_hi(x))
    t_lo = min(_time_once(f_lo, x) for _ in range(reps))
    t_hi = min(_time_once(f_hi, x) for _ in range(reps))
    return (t_hi - t_lo) / (k_hi - k_lo) * 1000.0


def _time_once(f, x):
    import jax

    t0 = time.perf_counter()
    jax.block_until_ready(f(x))
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1000)
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    from hover_net_tpu import runtime

    runtime.setup()
    import jax
    import jax.numpy as jnp

    from hover_net_tpu.models import HoVerNet, HoVerNetConfig
    from hover_net_tpu.data.tiling import bucket_grid_dim, prepare_tile_patching
    from hover_net_tpu.infer.steps import extract_patches, infer_output
    from hover_net_tpu.ops.post_proc_device import proc_np_hv_batch
    from hover_net_tpu.ops.post_proc_device import compact_labels_u16, instance_tables

    cfg = HoVerNetConfig(mode="fast", nr_types=None, width=args.width,
                         dtype=jnp.bfloat16)
    model = HoVerNet(cfg)
    win, step = cfg.patch_input_shape, cfg.patch_output_shape
    size = args.size
    pads, coords, grid = prepare_tile_patching((size, size), win, step)
    rows, cols = bucket_grid_dim(grid[0]), bucket_grid_dim(grid[1])
    canvas = rows * step + (win - step)
    print(f"# grid {grid} -> canonical ({rows},{cols}), canvas {canvas}^2")

    # synth variables from shapes (timing only)
    dummy = jnp.zeros((1, win, win, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), dummy, train=False))

    def synth(path, s):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        fill = 1.0 if name in ("scale", "var") else 0.01
        return jnp.full(s.shape, fill, s.dtype)

    variables = jax.tree_util.tree_map_with_path(synth, shapes)
    jax.block_until_ready(variables)

    rng = np.random.default_rng(0)
    img = jnp.asarray(
        rng.integers(0, 255, (canvas, canvas, 3), dtype=np.uint8),
        jnp.float32)
    ys = np.arange(0, rows * step, step, dtype=np.int32)
    xs = np.arange(0, cols * step, step, dtype=np.int32)
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    coords_dev = jnp.asarray(
        np.stack([yy.ravel(), xx.ravel()], axis=-1), jnp.int32)

    from bench import synth_pred_map
    full_h, full_w = rows * step, cols * step
    pred = jnp.asarray(synth_pred_map(full_h, full_w)[None])
    valid = jnp.zeros((1, full_h, full_w), bool) \
        .at[:, :size, :size].set(True)

    # ---- forward (gather + forward + stitch)
    def fwd_body(c):
        patches = extract_patches(c, coords_dev, win)
        out = infer_output(model, variables, patches)
        h, w, ch = out.shape[1], out.shape[2], out.shape[3]
        full = out.reshape(rows, cols, h, w, ch).transpose(0, 2, 1, 3, 4)
        full = full.reshape(rows * h, cols * w, ch)
        s = jnp.sum(full) * 1e-30
        return c + s, s

    ms = probe(fwd_body, img)
    print(f"forward_stitch_ms_per_tile: {ms:.1f}")

    # forward FLOPs for MFU
    @jax.jit
    def fwd_once(c):
        patches = extract_patches(c, coords_dev, win)
        return infer_output(model, variables, patches)

    try:
        ca = fwd_once.lower(img).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = ca.get("flops", 0.0)
        print(f"forward_flops_per_tile: {flops:.3e}")
        print(f"forward_mfu_pct_at_measured_ms: "
              f"{flops / (ms / 1000) / 394e12 * 100:.1f}  (v5e peak 394 Tbf16)")
    except Exception as e:
        print(f"# cost_analysis failed: {e!r}")

    # ---- post-proc (watershed tail on realistic content)
    def pp_body(c):
        inst = proc_np_hv_batch(c, valid)
        s = (jnp.sum(inst) % 1000).astype(jnp.float32) * 1e-20
        return c + s, s

    ms_pp = probe(pp_body, pred)
    print(f"post_proc_ms_per_tile: {ms_pp:.1f}")

    # ---- post-proc PREP only (minmax + Sobel-21 HIGHEST + masks): the
    # XLA stage ahead of the blocked Pallas kernel — kernel cost is the
    # difference vs post_proc_ms
    from hover_net_tpu.ops import filters

    def prep_body(c):
        blb = (c[..., 0] >= 0.5) & valid
        h_dir = filters.minmax_norm(c[..., 1], where=valid)
        v_dir = filters.minmax_norm(c[..., 2], where=valid)
        sobelh = 1.0 - filters.minmax_norm(filters.sobel_h(h_dir, 21),
                                           where=valid)
        sobelv = 1.0 - filters.minmax_norm(filters.sobel_v(v_dir, 21),
                                           where=valid)
        sob = jnp.maximum(sobelh, sobelv)
        s = (jnp.sum(sob) + jnp.sum(blb)) * 1e-30
        return c + s, s

    ms_prep = probe(prep_body, pred)
    print(f"pp_prep_ms_per_tile: {ms_prep:.1f}  "
          f"(blocked kernel ~= {ms_pp - ms_prep:.1f})")

    # ---- tables tail (compaction + per-instance stats/COO)
    inst0 = proc_np_hv_batch(pred, valid)

    def compact_body(c):
        inst, n = compact_labels_u16(c)
        s = (n[0] % 1000).astype(jnp.float32) * 1e-20 \
            + inst[0, 0, 0].astype(jnp.float32) * 1e-25
        return c + s.astype(c.dtype), s

    ms_cmp = probe(compact_body, inst0)
    print(f"compact_ms_per_tile: {ms_cmp:.1f}")

    def tab_body(c):
        inst, n = compact_labels_u16(c)
        # with_sums=False matches the untyped production tail
        # (infer/steps._tables_tail): sizes/centroids are reconstructed
        # on host from boundary-run pairing, no full-pixel scatter
        t = instance_tables(inst[0].astype(jnp.int32), None,
                            coo_cap=1 << 16, nr_types=None,
                            with_sums=False)
        s = (jnp.sum(t["stats"] if "stats" in t else t["bbox"])
             % 1000).astype(jnp.float32) * 1e-20
        return c + s.astype(c.dtype), s

    ms_tab = probe(tab_body, inst0)
    print(f"tables_ms_per_tile: {ms_tab:.1f}  "
          f"(instance_tables ~= {ms_tab - ms_cmp:.1f})")

    total = ms + ms_pp + ms_tab
    print(f"TOTAL_device_ms_per_tile: {total:.1f}  "
          f"(=> {1000.0 / total:.2f} tiles/s device-bound ceiling)")


if __name__ == "__main__":
    main()
