"""Inference-time fusion of the per-branch decoders into ONE
block-diagonal tower.

The reference runs one decoder per output head (net_desc.py:43-76,
124-143) sequentially; this repo's HoVerNet mirrors that for training.
At inference the branches are independent towers consuming the same
(d0, d1, d2, d3), and every conv in them is MXU-starved on TPU: the
DenseBlock's grouped convs have out-width w/2 = 32 — a quarter of the
128-wide MXU tile — so each branch pays full-tile cycles for
quarter-tile work. Stacking the branches' kernels into block-diagonal
dense kernels doubles/triples the N dimension and halves the number of
conv dispatches.

MEASURED RESULT (v5e, w64 fast untyped, 1000^2 tile, distinct random
weights, lax.scan K-delta probe): encoder-only 100.0 ms, per-branch
decoders 159.6 ms total forward, FUSED 167.7 ms — the fusion is ~8 ms
SLOWER. The decoders are HBM-bandwidth-bound, not MXU-tile-bound:
doubling every activation's channel width doubles the bytes moved,
which cancels (and slightly exceeds) the tile-packing win. The module
stays as an opt-in experiment (HNT_FUSED_DEC=1 in infer_output) and as
the fused-weight machinery, with tests pinning numerical equivalence.

Arithmetic is equivalent to the per-branch towers: off-block kernel
entries are exact zeros, so each output channel's contraction gains
only +0.0 terms (the wider contraction may reassociate the summation
— measured <=1e-6 relative drift); BN is per-channel and concatenates. The fused kernels
are assembled from the ordinary per-branch `variables` tree INSIDE the
jitted program — under `jit` the variables are embedded as constants,
so XLA constant-folds the assembly at compile time and the checkpoint
format / training path are untouched.

Channel-layout bookkeeping: activations are never permuted (a channel
shuffle on a [N,H,W,C] tensor is real HBM traffic); instead each
branch's channel positions inside the fused tensor are tracked
host-side (static python ints) and the KERNELS are scattered to match
— kernel assembly is free (compile-time consts). After every
DenseBlock concat the layout interleaves ([..oldA..|..oldB..|newA|newB]);
each u*_convf output restores per-branch contiguity.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .blocks import BN_EPS, upsample2x
from .hovernet import HoVerNetConfig
from ..utils.crops import crop_to_shape


def _bn_affine(bn_params, bn_stats):
    """Inference BatchNorm as a per-channel (scale, offset) pair."""
    inv = 1.0 / jnp.sqrt(bn_stats["var"] + BN_EPS)
    scale = bn_params["scale"] * inv
    offset = bn_params["bias"] - bn_stats["mean"] * scale
    return scale, offset


class _Layout:
    """Tracks each branch's channel indices inside the fused tensor."""

    def __init__(self, idx_per_branch):
        self.idx = [np.asarray(i, np.int64) for i in idx_per_branch]

    @classmethod
    def contiguous(cls, widths):
        idx, off = [], 0
        for w in widths:
            idx.append(np.arange(off, off + w))
            off += w
        return cls(idx)

    @property
    def total(self):
        return sum(len(i) for i in self.idx)

    def concat(self, other):
        """Layout after jnp.concatenate([x, new], -1) with `self` = x's
        layout and `other` = new's (contiguous within `new`)."""
        base = self.total
        return _Layout([np.concatenate([a, b + base])
                        for a, b in zip(self.idx, other.idx)])


def _scatter_kernel(kernels, layout_in, widths_out, dtype):
    """Block-structured dense kernel: branch b's [k,k,Cb_in,Cb_out]
    kernel lands at (layout_in.idx[b], contiguous out slot b)."""
    k = kernels[0].shape[0]
    cin = layout_in.total
    cout = sum(widths_out)
    dense = jnp.zeros((k, k, cin, cout), jnp.float32)
    off = 0
    for b, ker in enumerate(kernels):
        dense = dense.at[:, :, layout_in.idx[b], off:off + widths_out[b]] \
            .set(ker.astype(jnp.float32))
        off += widths_out[b]
    return dense.astype(dtype)


def _scatter_vec(vecs, layout, fill=0.0):
    out = jnp.full((layout.total,), fill, jnp.float32)
    for b, v in enumerate(vecs):
        out = out.at[layout.idx[b]].set(v.astype(jnp.float32))
    return out


def _conv(x, kernel, padding):
    import jax

    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _grouped_as_dense(branch_kernels, groups, layout_in, dtype):
    """Fused DenseUnit conv2: per-branch GroupedConvAsDense kernels
    ([k,k,in_cg,feat] grouped shape) -> one dense kernel whose input
    rows follow layout_in and whose outputs are contiguous per branch."""
    k = branch_kernels[0].shape[0]
    feats = [ker.shape[-1] for ker in branch_kernels]
    cin = layout_in.total
    cout = sum(feats)
    dense = jnp.zeros((k, k, cin, cout), jnp.float32)
    off = 0
    for b, ker in enumerate(branch_kernels):
        in_cg = ker.shape[2]
        feat = ker.shape[3]
        out_cg = feat // groups
        rows = layout_in.idx[b]
        assert len(rows) == in_cg * groups
        for g in range(groups):
            dense = dense.at[
                :, :, rows[g * in_cg:(g + 1) * in_cg],
                off + g * out_cg: off + (g + 1) * out_cg,
            ].set(ker[:, :, :, g * out_cg:(g + 1) * out_cg]
                  .astype(jnp.float32))
        off += feat
    return dense.astype(dtype)


def fused_decoders_apply(cfg: HoVerNetConfig, variables, feats):
    """Run all decoder branches as one block-diagonal tower.

    feats: (d0, d1, d2, d3) encoder outputs (already cropped as in
    HoVerNet.__call__). Returns {branch: [N,h,w,out_ch] float32} —
    numerically equivalent (<=1e-6 relative) to looping DecoderBranch
    per branch (inference only, running BN statistics)."""
    branches = cfg.branches
    nb = len(branches)
    w, k, dt = cfg.width, cfg.ksize, cfg.dtype
    params = variables["params"]
    stats = variables["batch_stats"]
    p_br = [params[f"decoder_{b}"] for b in branches]
    s_br = [stats[f"decoder_{b}"] for b in branches]
    d0, d1, d2, d3 = feats

    def dense_block(x, layout, name, count):
        """Fused DenseBlock (blocks.py DenseBlock): per-unit
        BN-ReLU -> 1x1 -> BN-ReLU -> grouped kxk, concat."""
        for i in range(count):
            def ubn(field, lay, i=i):
                scs = [_bn_affine(pb[name][f"unit{i}"][field],
                                  sb[name][f"unit{i}"][field])
                       for pb, sb in zip(p_br, s_br)]
                return (_scatter_vec([s for s, _ in scs], lay, 1.0),
                        _scatter_vec([o for _, o in scs], lay, 0.0))

            def ukern(field, i=i):
                return [pb[name][f"unit{i}"][field]["kernel"]
                        for pb in p_br]

            # preact bn+relu
            sc, of = ubn("preact_bn", layout)
            h = jnp.maximum(x * sc.astype(x.dtype) + of.astype(x.dtype), 0)
            # conv1 1x1 (out contiguous per branch: 2w each)
            ker = _scatter_kernel(ukern("conv1"), layout, [2 * w] * nb, dt)
            h = _conv(h.astype(dt), ker, "VALID")
            l1 = _Layout.contiguous([2 * w] * nb)
            # conv1_bn + relu
            sc, of = ubn("conv1_bn", l1)
            h = jnp.maximum(h * sc.astype(h.dtype) + of.astype(h.dtype), 0)
            # grouped conv2 (VALID, shrinks by k-1)
            ker = _grouped_as_dense(ukern("conv2"), 4, l1, dt)
            new = _conv(h, ker, "VALID")
            new_layout = _Layout.contiguous([w // 2] * nb)
            x = crop_to_shape(x, (new.shape[1], new.shape[2]))
            x = jnp.concatenate([x, new], axis=-1)
            layout = layout.concat(new_layout)
        # closing bn + relu
        scs = [_bn_affine(pb[name]["bn"], sb[name]["bn"])
               for pb, sb in zip(p_br, s_br)]
        sc = _scatter_vec([s for s, _ in scs], layout, 1.0)
        of = _scatter_vec([o for _, o in scs], layout, 0.0)
        x = jnp.maximum(x * sc.astype(x.dtype) + of.astype(x.dtype), 0)
        return x, layout

    def shared_conv(x, name, widths_out):
        """Conv whose input is SHARED (unfused single tensor): kernels
        concat along out."""
        kers = [pb[name]["kernel"] for pb in p_br]
        ker = jnp.concatenate([kk.astype(jnp.float32) for kk in kers],
                              axis=-1).astype(dt)
        return _conv(x.astype(dt), ker, "VALID")

    def fused_conv(x, layout, name, widths_out, padding="VALID"):
        kers = [pb[name]["kernel"] for pb in p_br]
        ker = _scatter_kernel(kers, layout, widths_out, dt)
        return _conv(x, ker, padding)

    def tile_skip(skip):
        """Per-branch copy of a shared skip tensor (the fused layout is
        always contiguous per branch at the skip-add points)."""
        return jnp.concatenate([skip] * nb, axis=-1)

    # ---- u3 (input shared by all branches)
    x0 = upsample2x(d3) + d2
    x = shared_conv(x0, "u3_conva", [4 * w] * nb)
    layout = _Layout.contiguous([4 * w] * nb)
    x, layout = dense_block(x, layout, "u3_dense", 8)
    x = fused_conv(x, layout, "u3_convf", [8 * w] * nb)
    layout = _Layout.contiguous([8 * w] * nb)

    # ---- u2
    x = upsample2x(x) + tile_skip(d1)
    x = fused_conv(x, layout, "u2_conva", [2 * w] * nb)
    layout = _Layout.contiguous([2 * w] * nb)
    x, layout = dense_block(x, layout, "u2_dense", 4)
    x = fused_conv(x, layout, "u2_convf", [4 * w] * nb)
    layout = _Layout.contiguous([4 * w] * nb)

    # ---- u1
    x = upsample2x(x) + tile_skip(d0)
    x = fused_conv(x, layout, "u1_conva", [w] * nb, padding="SAME")
    layout = _Layout.contiguous([w] * nb)

    # ---- u0 heads (float32, with bias)
    scs = [_bn_affine(pb["u0_bn"], sb["u0_bn"]) for pb, sb in zip(p_br, s_br)]
    sc = _scatter_vec([s for s, _ in scs], layout, 1.0)
    of = _scatter_vec([o for _, o in scs], layout, 0.0)
    x = jnp.maximum(x * sc.astype(x.dtype) + of.astype(x.dtype), 0)
    out_ch = [cfg.branch_channels(b) for b in branches]
    kers = [pb["u0_conv"]["kernel"] for pb in p_br]
    ker = _scatter_kernel(kers, layout, out_ch, jnp.float32)
    y = _conv(x.astype(jnp.float32), ker, "VALID")
    bias = jnp.concatenate(
        [pb["u0_conv"]["bias"].astype(jnp.float32) for pb in p_br])
    y = y + bias
    out, off = {}, 0
    for b, c in zip(branches, out_ch):
        out[b] = y[..., off:off + c]
        off += c
    return out
