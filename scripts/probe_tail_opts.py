"""A/B device-time probes for post-proc tail optimization candidates.

Each candidate is timed with the same K-delta lax.scan methodology as
scripts/probe_device_time.py (dispatch latency and link weather cancel).
Batched into ONE process so the compile cache is shared and the tunnel
is paid once.

Candidates (round 5, attacking the 261.8 ms/tile device ceiling):
  sobel_conv   — current separable Sobel-21 as C=1 HIGHEST convs
  sobel_shift  — same arithmetic as 21 shifted fused multiply-adds
                 (C=1 convs can't use the MXU; shifts are pure VPU)
  minmax       — masked min-max normalisations alone
  compact      — compact_labels_u16 (cumsum + gather)
  cumsum_only  — the bare [1.3M] int32 cumsum (is the prefix scan or
                 the gather the cost?)
  boundary     — instance_tables' 8-direction boundary/mask8 stage
  coo_extract  — cumsum + searchsorted COO compaction
  bbox_scatter — the scatter-min/max bbox reduction

Usage: python scripts/probe_tail_opts.py [--size 1000]
"""

import argparse
import os
import sys

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

    from hover_net_tpu.ops import filters
    from hover_net_tpu.ops.post_proc_device import (
        compact_labels_u16, instance_tables, proc_np_hv_batch, INT_MAX,
        _DIRS8, _shift2d,
    )
    from bench import synth_pred_map

    size = args.size
    # canonical full-map size for a 1000^2 tile: 7x164 = 1148
    full = 7 * 164 if size == 1000 else size
    pred = jnp.asarray(synth_pred_map(full, full)[None])
    valid = jnp.zeros((1, full, full), bool).at[:, :size, :size].set(True)

    # ---------------- sobel variants
    def sobel_conv_body(c):
        h_dir = filters.minmax_norm(c[..., 1], where=valid)
        v_dir = filters.minmax_norm(c[..., 2], where=valid)
        sh = 1.0 - filters.minmax_norm(filters.sobel_h(h_dir, 21), where=valid)
        sv = 1.0 - filters.minmax_norm(filters.sobel_v(v_dir, 21), where=valid)
        s = jnp.sum(jnp.maximum(sh, sv)) * 1e-30
        return c + s, s

    def _sep_shift(x, krow, kcol):
        pr, pc = len(krow) // 2, len(kcol) // 2
        xp = jnp.pad(x, ((0, 0), (pr, pr), (0, 0)), mode="reflect")
        h = x.shape[1]
        acc = None
        for j, kv in enumerate(krow):
            t = xp[:, j:j + h, :] * kv
            acc = t if acc is None else acc + t
        xp = jnp.pad(acc, ((0, 0), (0, 0), (pc, pc)), mode="reflect")
        w = x.shape[2]
        acc = None
        for j, kv in enumerate(kcol):
            t = xp[:, :, j:j + w] * kv
            acc = t if acc is None else acc + t
        return acc

    def sobel_shift_body(c):
        deriv, smooth = filters.sobel_kernels(21)
        h_dir = filters.minmax_norm(c[..., 1], where=valid)
        v_dir = filters.minmax_norm(c[..., 2], where=valid)
        sh = 1.0 - filters.minmax_norm(_sep_shift(h_dir, smooth, deriv),
                                       where=valid)
        sv = 1.0 - filters.minmax_norm(_sep_shift(v_dir, deriv, smooth),
                                       where=valid)
        s = jnp.sum(jnp.maximum(sh, sv)) * 1e-30
        return c + s, s

    def minmax_body(c):
        a = filters.minmax_norm(c[..., 1], where=valid)
        b = filters.minmax_norm(c[..., 2], where=valid)
        s = (jnp.sum(a) + jnp.sum(b)) * 1e-30
        return c + s, s

    for name, body in (("sobel_conv", sobel_conv_body),
                       ("sobel_shift", sobel_shift_body),
                       ("minmax", minmax_body)):
        ms = probe(body, pred)
        print(f"{name}_ms: {ms:.2f}", flush=True)

    # ---------------- tables-tail components
    inst0 = proc_np_hv_batch(pred, valid)
    inst0 = jax.block_until_ready(inst0)

    def compact_body(c):
        inst, n = compact_labels_u16(c)
        s = (n[0] % 1000).astype(jnp.float32) * 1e-20 \
            + inst[0, 0, 0].astype(jnp.float32) * 1e-25
        return c + s.astype(c.dtype), s

    print(f"compact_ms: {probe(compact_body, inst0):.2f}", flush=True)

    def cumsum_body(c):
        flat = c.ravel()
        iota1 = jnp.arange(1, flat.shape[0] + 1, dtype=jnp.int32)
        present = (flat == iota1).astype(jnp.int32)
        ranks = jnp.cumsum(present)
        s = ranks[-1].astype(jnp.float32) * 1e-20
        return c + s.astype(c.dtype), s

    print(f"cumsum_only_ms: {probe(cumsum_body, inst0):.2f}", flush=True)

    def boundary_body(c):
        lab = c[0]
        same = jnp.zeros(lab.shape, jnp.int32)
        for k, (dy, dx) in enumerate(_DIRS8):
            nb = _shift2d(lab, dy, dx, 0)
            same = same | (((nb == lab) & (lab > 0)).astype(jnp.int32) << k)
        boundary = (lab > 0) & (same != 0xFF)
        s = jnp.sum(boundary.astype(jnp.int32)).astype(jnp.float32) * 1e-20
        return c + s.astype(c.dtype), s

    print(f"boundary_ms: {probe(boundary_body, inst0):.2f}", flush=True)

    coo_cap = 1 << 16

    def coo_body(c):
        lab = c[0]
        h, w = lab.shape
        same = jnp.zeros(lab.shape, jnp.int32)
        for k, (dy, dx) in enumerate(_DIRS8):
            nb = _shift2d(lab, dy, dx, 0)
            same = same | (((nb == lab) & (lab > 0)).astype(jnp.int32) << k)
        boundary = (lab > 0) & (same != 0xFF)
        flatb = boundary.ravel().astype(jnp.int32)
        cum = jnp.cumsum(flatb)
        pos = jnp.searchsorted(
            cum, jnp.arange(1, coo_cap + 1, dtype=jnp.int32), side="left")
        s = (pos[-1] % 1000).astype(jnp.float32) * 1e-20
        return c + s.astype(c.dtype), s

    print(f"boundary_coo_ms: {probe(coo_body, inst0):.2f}", flush=True)

    def tables_body(c):
        inst, n = compact_labels_u16(c)
        t = instance_tables(inst[0].astype(jnp.int32), None,
                            coo_cap=coo_cap, nr_types=None, with_sums=False)
        s = (jnp.sum(t["bbox"]) % 1000).astype(jnp.float32) * 1e-20
        return c + s.astype(c.dtype), s

    print(f"tables_full_ms: {probe(tables_body, inst0):.2f}", flush=True)


if __name__ == "__main__":
    main()
