"""Forward sub-stage device-time split (lax.scan K-delta method).

Decomposes the fused tile forward (gather + HoVerNet + stitch) into
encoder/decoder sub-stages to locate the MFU gap VERDICT r4 flagged
(forward 129 ms vs a ~27 ms peak-flops floor). Each sub-stage runs the
network prefix up to a cut point; stage cost = delta between adjacent
prefixes, so per-stage numbers include exactly the ops the full
pipeline executes (same fusion opportunities at the boundaries modulo
the cut).

Usage: python scripts/probe_forward_split.py [--width 64]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from probe_device_time import probe  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1000)
    ap.add_argument("--width", type=int, default=64)
    args = ap.parse_args()

    from hover_net_tpu import runtime

    runtime.setup()
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from hover_net_tpu.models import HoVerNet, HoVerNetConfig
    from hover_net_tpu.models.hovernet import DecoderBranch
    from hover_net_tpu.models.blocks import ConvBNRelu, ResidualBlock
    from hover_net_tpu.data.tiling import bucket_grid_dim, prepare_tile_patching
    from hover_net_tpu.infer.steps import extract_patches
    from hover_net_tpu.utils.crops import crop_op

    cfg = HoVerNetConfig(mode="fast", nr_types=None, width=args.width,
                         dtype=jnp.bfloat16)
    model = HoVerNet(cfg)
    win, step = cfg.patch_input_shape, cfg.patch_output_shape
    pads, coords, grid = prepare_tile_patching((args.size, args.size), win, step)
    rows, cols = bucket_grid_dim(grid[0]), bucket_grid_dim(grid[1])
    canvas = rows * step + (win - step)
    print(f"# grid ({rows},{cols}), canvas {canvas}^2, width {args.width}")

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

    # A stripped HoVerNet whose __call__ stops at a chosen cut point.
    class Prefix(nn.Module):
        cfg: HoVerNetConfig
        cut: str  # d0 | enc | dec1 | full

        @nn.compact
        def __call__(self, imgs):
            c = self.cfg
            w, dt = c.width, c.dtype
            x = imgs.astype(dt) / 255.0
            x = ConvBNRelu(w, 7, padding="SAME", dtype=dt, name="conv0")(
                x, False)
            d0 = ResidualBlock(ch=(w, w, 4 * w), count=3, stride=1, dtype=dt,
                               name="d0")(x, False)
            if self.cut == "d0":
                return d0
            d1 = ResidualBlock(ch=(2 * w, 2 * w, 8 * w), count=4, stride=2,
                               dtype=dt, name="d1")(d0, False)
            d2 = ResidualBlock(ch=(4 * w, 4 * w, 16 * w), count=6, stride=2,
                               dtype=dt, name="d2")(d1, False)
            d3 = ResidualBlock(ch=(8 * w, 8 * w, 32 * w), count=3, stride=2,
                               dtype=dt, name="d3")(d2, False)
            d3 = nn.Conv(16 * w, (1, 1), use_bias=False, dtype=dt,
                         name="conv_bot")(d3)
            if self.cut == "enc":
                return d3
            k = c.ksize
            td1 = (2 * (d2.shape[1] - 9 * (k - 1)),
                   2 * (d2.shape[2] - 9 * (k - 1)))
            td0 = (2 * (td1[0] - 5 * (k - 1)), 2 * (td1[1] - 5 * (k - 1)))
            d1 = crop_op(d1, (d1.shape[1] - td1[0], d1.shape[2] - td1[1]))
            d0 = crop_op(d0, (d0.shape[1] - td0[0], d0.shape[2] - td0[1]))
            outs = []
            n_br = 1 if self.cut == "dec1" else len(c.branches)
            for name in c.branches[:n_br]:
                outs.append(DecoderBranch(
                    cfg=c, out_ch=c.branch_channels(name),
                    name=f"decoder_{name}")((d0, d1, d2, d3), False))
            return jnp.concatenate(outs, axis=-1)

    results = {}
    for cut in ("d0", "enc", "dec1", "full"):
        pm = Prefix(cfg=cfg, cut=cut)
        pv = jax.eval_shape(lambda m=pm: m.init(
            jax.random.PRNGKey(0), dummy))
        pvars = jax.tree_util.tree_map_with_path(synth, pv)

        def body(c, pm=pm, pvars=pvars):
            patches = extract_patches(c, coords_dev, win)
            out = pm.apply(pvars, patches)
            s = jnp.sum(out.astype(jnp.float32)) * 1e-30
            return c + s, s

        t0 = time.perf_counter()
        ms = probe(body, img)
        results[cut] = ms
        print(f"prefix[{cut}]: {ms:.1f} ms  "
              f"(compile+probe {time.perf_counter() - t0:.0f}s)", flush=True)

    print(f"stage stem+d0:        {results['d0']:.1f} ms")
    print(f"stage d1-d3+bot:      {results['enc'] - results['d0']:.1f} ms")
    print(f"stage decoder (one):  {results['dec1'] - results['enc']:.1f} ms")
    print(f"stage decoders (two more): "
          f"{results['full'] - results['dec1']:.1f} ms")
    print(f"full forward:         {results['full']:.1f} ms")


if __name__ == "__main__":
    main()
