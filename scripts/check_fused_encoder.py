"""Fused-encoder (models/encoder_pallas.py) on-chip check: numerical
drift vs the standard XLA forward + device-time comparison (lax.scan
K-delta method, tunnel-insensitive).

Usage: python scripts/check_fused_encoder.py [--width 64] [--n 49]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def kdelta(fn, x, k_lo=2, k_hi=8, reps=3):
    import jax
    import jax.numpy as jnp

    def run_k(k):
        @jax.jit
        def f(c):
            def body(c, _):
                out = fn(c)
                s = sum(jnp.sum(v.astype(jnp.float32)) * 1e-20
                        for v in out.values())
                return jax.lax.optimization_barrier(c + s.astype(c.dtype)), s
            c, ys = jax.lax.scan(body, c, None, length=k)
            return jnp.sum(ys)
        return f

    f_lo, f_hi = run_k(k_lo), run_k(k_hi)
    import jax
    jax.block_until_ready(f_lo(x))
    jax.block_until_ready(f_hi(x))

    def t(f):
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(x))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(f_hi) - t(f_lo)) / (k_hi - k_lo) * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--n", type=int, default=49)
    args = ap.parse_args()

    from hover_net_tpu import runtime

    runtime.setup()
    import jax
    import jax.numpy as jnp

    from hover_net_tpu.models import HoVerNet, HoVerNetConfig
    from hover_net_tpu.models.encoder_pallas import fused_forward

    cfg = HoVerNetConfig(mode="fast", nr_types=None, width=args.width,
                         dtype=jnp.bfloat16)
    model = HoVerNet(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 256, 256, 3)), train=False)
    # perturb init so BN stats aren't the degenerate 0/1 defaults
    variables = jax.tree.map(
        lambda v: v + 0.05 * jax.random.normal(
            jax.random.PRNGKey(v.size % 9973), v.shape, v.dtype),
        variables)
    x = jax.random.randint(jax.random.PRNGKey(1), (args.n, 256, 256, 3),
                           0, 255).astype(jnp.float32)

    std = jax.jit(lambda c: model.apply(variables, c, train=False))
    fus = jax.jit(lambda c: fused_forward(cfg, variables, c))

    r = std(x)
    o = fus(x)
    for k in r:
        rr = np.asarray(r[k], np.float32)
        oo = np.asarray(o[k], np.float32)
        d = np.abs(rr - oo)
        print(f"{k}: maxdiff {d.max():.5f} p999 {np.quantile(d, 0.999):.5f}"
              f" ref_absmax {np.abs(rr).max():.3f}")

    ms_std = kdelta(std, x)
    ms_fus = kdelta(fus, x)
    print(f"device ms/forward: standard {ms_std:.1f}  fused {ms_fus:.1f}"
          f"  speedup {ms_std / ms_fus:.2f}x")


if __name__ == "__main__":
    main()
