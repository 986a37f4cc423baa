"""Pallas TPU kernels: whole encoder residual blocks fused in VMEM.

The inference forward is HBM-bandwidth-bound, not MXU-bound (VERDICT
r4: 20.8% forward MFU; probe_forward_split: stem+d0 38 ms, d1-d3+bot
60 ms at w64/fast/49x256^2). The cause is structural: a preact
bottleneck unit round-trips its wide (4w..32w channel) activations
through HBM ~7 times (preact BN, 1x1, BN, 3x3, BN, 1x1, residual add),
and XLA cannot fuse across convolutions. This module runs EVERY unit
of a ResidualBlock group (models/blocks.py ResidualBlock, mirroring
net_utils.py:155-266) inside ONE Pallas kernel over spatial tiles:

  HBM traffic per block = read input once + write output once
  (vs ~2 reads + 2 writes of the wide map PER UNIT for the XLA path).

Per spatial tile (output tile TH x TW, halo = 1px per fused 3x3):
  - DMA the input window (tile + halo) HBM -> VMEM
  - shortcut 1x1 conv (stride 1 or 2) as one MXU matmul
  - unit0: 1x1 -> BN+ReLU -> 3x3 (stride 1/2, SAME) -> BN+ReLU -> 1x1
  - units 1..n-1: preact BN+ReLU -> same tower, rolling shortcut
    (each unit's sum is the next unit's shortcut, net_utils.py:242)
  - final block BN+ReLU epilogue
  - write the TH x TW x Cout output block

SAME-padding parity: XLA pads each conv2's INPUT map with zeros at the
map edge. In-kernel, halo pixels outside the global map carry nonzero
garbage (e.g. relu(bn_offset) of zero input), so every conv2 input is
masked to zero outside the global [0, S) bounds before the 3x3 — this
reproduces XLA's SAME semantics bit-for-bit at the boundary. Strided
(stride-2, k=3, even size) SAME pads 0 top/left and 1 bottom/right
(TF/XLA rule); the kernel reads out[q] = sum_k in[2q+k] with the +1
bottom pad baked into the pre-padded input.

Numerics: activations bf16, every matmul accumulates f32 on the MXU
(preferred_element_type), conv outputs cast to bf16 BEFORE the folded
BN scale/offset applies in bf16 — the same rounding points as the XLA
path (flax conv returns bf16; BatchNorm promotes operands to bf16).
Equivalence vs the standard `model.apply` is tolerance-pinned in
tests/test_encoder_pallas.py (interpret mode on CPU) and measured on
TPU by scripts/check_fused_encoder.py.

STATUS — opt-in experiment (HNT_FUSED_ENC=1), NOT the production
default. Measured on the v5e chip (w64, 49x256^2 d0 shapes, lax.scan
K-delta): the fused d0 kernel runs 103.7 ms vs 39.0 ms for XLA's
per-conv path — 2.7x SLOWER despite ~5x less HBM traffic. The losses:
784 grid invocations of ~20 us of useful flops each (per-step DMA
issue + Mosaic prologue overheads dominate), 64-wide matmuls using a
quarter of the 128x128 MXU tile, and Mosaic relayouts around the
shifted 3x3 slices. The correctness machinery (bit-exact tiling,
SAME-boundary masking, stride-2 phase sampling, rolling-shortcut
split) is pinned by tests/test_encoder_pallas.py and is the base for
future tuning (im2col conv2, wider tiles with double-buffered window
DMA, channel-packed layouts). The kernel consumes the ordinary
`variables` tree at trace time (jit constant-folds the packing), so
checkpoints and the training path are untouched either way.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .blocks import BN_EPS

BF16 = jnp.bfloat16


def _bn_affine(bn_params, bn_stats):
    """Inference BatchNorm as per-channel (scale, offset), f32."""
    inv = 1.0 / jnp.sqrt(bn_stats["var"].astype(jnp.float32) + BN_EPS)
    scale = bn_params["scale"].astype(jnp.float32) * inv
    offset = (bn_params["bias"].astype(jnp.float32)
              - bn_stats["mean"].astype(jnp.float32) * scale)
    return scale, offset


# ----------------------------------------------------------- param packing

def _pack_units(bp, bs, idxs, cout):
    """Stack units idxs (all preact) into kernel-ready arrays."""
    ps, po, w1, s1, o1, w2, s2, o2, w3 = [], [], [], [], [], [], [], [], []
    for i in idxs:
        up, us = bp[f"unit{i}"], bs[f"unit{i}"]
        s, o = _bn_affine(up["preact_bn"], us["preact_bn"])
        ps.append(s)
        po.append(o)
        w1.append(up["conv1"]["kernel"][0, 0])
        s, o = _bn_affine(up["conv1_bn"], us["conv1_bn"])
        s1.append(s)
        o1.append(o)
        w2.append(up["conv2"]["kernel"])
        s, o = _bn_affine(up["conv2_bn"], us["conv2_bn"])
        s2.append(s)
        o2.append(o)
        w3.append(up["conv3"]["kernel"][0, 0])
    c1 = w1[0].shape[-1]
    return {
        "ps": jnp.stack(ps),                      # [U, cout] f32
        "po": jnp.stack(po),
        "w1r": jnp.stack(w1).astype(BF16),        # [U, cin_u, c1]
        "s1r": jnp.stack(s1),                     # [U, c1]
        "o1r": jnp.stack(o1),
        # [U*9, c1, c1] — flattened so the kernel indexes 3-D VMEM refs
        "w2r": jnp.stack(w2).reshape(len(idxs) * 9, c1, c1).astype(BF16),
        "s2r": jnp.stack(s2),
        "o2r": jnp.stack(o2),
        "w3r": jnp.stack(w3).astype(BF16),        # [U, c1, cout]
    }


def pack_block(bp, bs, count: int, *, has_u0: bool = True,
               final_bn: bool = True, unit_base: int = 0):
    """Kernel-ready parameter dict for one fused block (or sub-chain).

    bp/bs: the block's params/batch_stats subtrees (e.g.
    variables["params"]["d0"]). has_u0: include the no-preact unit0 +
    shortcut conv stage (False = continuation chain, shortcut is the
    input itself). unit_base: first unit index (3 for the d2 tail)."""
    out: Dict[str, Any] = {}
    rest_start = unit_base
    if has_u0:
        out["wsc"] = bp["shortcut"]["kernel"][0, 0].astype(BF16)
        u0p, u0s = bp["unit0"], bs["unit0"]
        out["w1_0"] = u0p["conv1"]["kernel"][0, 0].astype(BF16)
        s, o = _bn_affine(u0p["conv1_bn"], u0s["conv1_bn"])
        out["s1_0"], out["o1_0"] = s, o
        out["w2_0"] = (u0p["conv2"]["kernel"]
                       .reshape(9, *u0p["conv2"]["kernel"].shape[2:])
                       .astype(BF16))
        s, o = _bn_affine(u0p["conv2_bn"], u0s["conv2_bn"])
        out["s2_0"], out["o2_0"] = s, o
        out["w3_0"] = u0p["conv3"]["kernel"][0, 0].astype(BF16)
        rest_start = 1
    cout = (out["w3_0"].shape[-1] if has_u0
            else bp[f"unit{unit_base}"]["conv3"]["kernel"].shape[-1])
    idxs = list(range(rest_start, unit_base + count))
    if idxs:
        out.update(_pack_units(bp, bs, idxs, cout))
    if final_bn:
        s, o = _bn_affine(bp["bn"], bs["bn"])
        out["sb"], out["ob"] = s, o
    return out


# ------------------------------------------------------------- the kernel

def _mask_oob(x, gy0, gx0, sh: int, sw: int):
    """Zero pixels whose global coords fall outside [0,sh) x [0,sw) —
    XLA SAME-pad semantics for in-kernel halos. Built as a 3-D iota +
    0/1 multiply: Mosaic rejects minor-dim insertion on i1 vectors
    (mask[..., None]), and a multiply by an exact 0/1 bf16 zeroes
    exactly."""
    h, w = x.shape[0], x.shape[1]
    r = jax.lax.broadcasted_iota(jnp.int32, (h, w, 1), 0) + gy0
    c = jax.lax.broadcasted_iota(jnp.int32, (h, w, 1), 1) + gx0
    ok = (r >= 0) & (r < sh) & (c >= 0) & (c < sw)
    return x * ok.astype(x.dtype)


def _mm(a2d, w, s=None, o=None):
    """[M, Cin] bf16 @ [Cin, Cout] bf16 -> f32 acc -> bf16 (+ folded BN
    + ReLU when s is given) — the XLA path's rounding points."""
    y = jnp.dot(a2d, w, preferred_element_type=jnp.float32).astype(BF16)
    if s is not None:
        y = jnp.maximum(y * s.astype(BF16) + o.astype(BF16), 0)
    return y


def _conv3x3(t3, w2_ref, base: int, s, o):
    """VALID 3x3 over a masked [H, W, C] bf16 map via 9 accumulating
    MXU matmuls; w2_ref rows base..base+8 hold the 3x3 taps."""
    h, w, c = t3.shape
    acc = None
    for dy in range(3):
        for dx in range(3):
            a = t3[dy:h - 2 + dy, dx:w - 2 + dx, :].reshape(-1, c)
            v = jnp.dot(a, w2_ref[base + dy * 3 + dx],
                        preferred_element_type=jnp.float32)
            acc = v if acc is None else acc + v
    y = acc.astype(BF16)
    y = jnp.maximum(y * s.astype(BF16) + o.astype(BF16), 0)
    return y.reshape(h - 2, w - 2, c)


def _phases3(t, m: int, axis: int):
    """Rows (2q, 2q+1, 2q+2) of a (2m+1)-long axis, each m long —
    reshape-only stride-2 sampling (no strided slices in Mosaic)."""
    if axis == 0:
        a = t[:-1].reshape(m, 2, *t.shape[1:])
        b = t[1:].reshape(m, 2, *t.shape[1:])
        return a[:, 0], a[:, 1], b[:, 1]
    assert axis == 1
    a = t[:, :-1].reshape(t.shape[0], m, 2, *t.shape[2:])
    b = t[:, 1:].reshape(t.shape[0], m, 2, *t.shape[2:])
    return a[:, :, 0], a[:, :, 1], b[:, :, 1]


def _conv3x3_s2(t3, w2_ref, m: int, mw: int, s, o):
    """Stride-2 SAME 3x3: out[q] = sum_k in[2q+k] on a (2m+1)-row
    masked window -> [m, mw, C]."""
    c = t3.shape[-1]
    rows = _phases3(t3, m, axis=0)
    acc = None
    for dy in range(3):
        cols = _phases3(rows[dy], mw, axis=1)
        for dx in range(3):
            a = cols[dx].reshape(-1, c)
            v = jnp.dot(a, w2_ref[dy * 3 + dx],
                        preferred_element_type=jnp.float32)
            acc = v if acc is None else acc + v
    y = jnp.maximum(acc.astype(BF16) * s.astype(BF16) + o.astype(BF16), 0)
    return y.reshape(m, mw, c)


def _build_block_call(*, n: int, s_in: int, s_out: int, cin: int, c1: int,
                      cout: int, count: int, stride: int, has_u0: bool,
                      final_bn: bool, th: int, interpret: bool = False):
    """pallas_call for one fused block over an [n, s_in, s_in, cin]
    input (pre-padded by the caller; see fused_block_apply)."""
    u_rest = count - 1 if has_u0 else count
    if has_u0 and stride == 1:
        halo = count            # 1px per 3x3 at constant resolution
    elif has_u0:
        halo = u_rest           # output-res halo of the stride-1 tail
    else:
        halo = count
    tw = th
    if stride == 2:
        wh = 2 * (th + 2 * halo) + 1
        pad_lo, pad_hi = 2 * halo, 2 * halo + 1
    else:
        wh = th + 2 * halo
        pad_lo = pad_hi = halo
    # Mosaic requires DMA slice sublane dims 8-aligned: fetch an
    # 8-rounded window and slice down in-value; the caller pads the
    # input bottom/right by the slack so every fetch stays in bounds
    wh8 = -(-wh // 8) * 8
    pad_hi += wh8 - wh
    grid = (n, s_out // th, s_out // tw)

    # kernel argument order (must match the arrays fused_block_apply
    # passes): optional u0 group, optional rest group, optional final bn
    names = []
    if has_u0:
        names += ["wsc", "w1_0", "s1_0", "o1_0", "w2_0", "s2_0", "o2_0",
                  "w3_0"]
    if u_rest:
        names += ["ps", "po", "w1r", "s1r", "o1r", "w2r", "s2r", "o2r",
                  "w3r"]
    if final_bn:
        names += ["sb", "ob"]

    def kernel(xp_ref, *refs):
        # load every weight ref once (they live whole in VMEM)
        w = {nm: r[...] for nm, r in zip(names, refs[:len(names)])}
        xwin_ref, sem = refs[len(names):]
        nb = pl.program_id(0)
        iy = pl.program_id(1)
        ix = pl.program_id(2)
        y0 = iy * th
        x0 = ix * tw
        cp = pltpu.make_async_copy(
            xp_ref.at[nb, pl.ds(y0 * stride, wh8), pl.ds(x0 * stride, wh8),
                      :],
            xwin_ref, sem)
        cp.start()
        cp.wait()
        xw = xwin_ref[...]
        if wh8 != wh:
            xw = xw[:wh, :wh]

        if has_u0:
            if stride == 2:
                m = th + 2 * halo
                # shortcut: 1x1 stride-2 samples in[2q] (SAME, k=1)
                xs = _phases3(_phases3(xw, m, 0)[0], m, 1)[0]
                sc = _mm(xs.reshape(-1, cin), w["wsc"]).reshape(m, m, cout)
                t = _mm(xw.reshape(-1, cin), w["w1_0"], w["s1_0"],
                        w["o1_0"]).reshape(wh, wh, c1)
                t = _mask_oob(t, 2 * (y0 - halo), 2 * (x0 - halo),
                              s_in, s_in)
                y = _conv3x3_s2(t, w["w2_0"], m, m, w["s2_0"], w["o2_0"])
            else:
                m = wh - 2
                sc = _mm(xw.reshape(-1, cin), w["wsc"]).reshape(wh, wh, cout)
                sc = sc[1:-1, 1:-1]
                t = _mm(xw.reshape(-1, cin), w["w1_0"], w["s1_0"],
                        w["o1_0"]).reshape(wh, wh, c1)
                t = _mask_oob(t, y0 - halo, x0 - halo, s_out, s_out)
                y = _conv3x3(t, w["w2_0"], 0, w["s2_0"], w["o2_0"])
            y3 = _mm(y.reshape(-1, c1), w["w3_0"]).reshape(*y.shape[:2], cout)
            prev = y3 + sc
            h = prev.shape[0]
            hoff = halo - 1 if stride == 1 else halo
        else:
            prev = xw
            h = wh
            hoff = halo

        for u in range(u_rest):
            a = jnp.maximum(
                prev * w["ps"][u:u + 1].reshape(1, 1, cout).astype(BF16)
                + w["po"][u:u + 1].reshape(1, 1, cout).astype(BF16), 0)
            t = _mm(a.reshape(-1, cout), w["w1r"][u], w["s1r"][u:u + 1],
                    w["o1r"][u:u + 1]).reshape(h, h, c1)
            t = _mask_oob(t, y0 - hoff, x0 - hoff, s_out, s_out)
            y = _conv3x3(t, w["w2r"], u * 9, w["s2r"][u:u + 1],
                         w["o2r"][u:u + 1])
            y3 = _mm(y.reshape(-1, c1), w["w3r"][u]).reshape(
                h - 2, h - 2, cout)
            prev = y3 + prev[1:-1, 1:-1]
            h -= 2
            hoff -= 1

        out = prev
        if final_bn:
            out = jnp.maximum(
                out * w["sb"].reshape(1, 1, cout).astype(BF16)
                + w["ob"].reshape(1, 1, cout).astype(BF16), 0)
        return out

    def kernel_entry(xp_ref, *refs):
        out_ref = refs[len(names)]
        rest = refs[:len(names)] + refs[len(names) + 1:]
        out_ref[0] = kernel(xp_ref, *rest)

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(names)
    call = pl.pallas_call(
        kernel_entry,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, th, tw, cout),
                               lambda nb, i, j: (nb, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, s_out, s_out, cout), BF16),
        scratch_shapes=[pltpu.VMEM((wh8, wh8, cin), BF16),
                        pltpu.SemaphoreType.DMA(())],
        # the default 16 MiB scoped-vmem cap rejects the fused chain's
        # live temporaries (~43 MiB at th=64); v5e has 128 MiB VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )
    return call, names, (pad_lo, pad_hi)


def _pick_tile(s_out: int, stride: int, halo: int, cin: int, cout: int,
               budget: int = 14 * 2 ** 20) -> Optional[int]:
    """Largest 8-aligned divisor of s_out whose window buffers fit the
    budget (input window + 2 wide maps + temporaries, bf16). The
    14 MiB default is a COMPILE-memory bound, not a VMEM one: Mosaic
    unrolls kernels into vreg-granular ops, and windows much past this
    OOM-kill the compiler (observed at th=128 / 134^2x256 buffers);
    VMEM itself (128 MiB on v5e) is not the binding constraint."""
    for th in sorted((d for d in range(8, s_out + 1)
                      if s_out % d == 0 and d % 8 == 0), reverse=True):
        wh = 2 * (th + 2 * halo) + 1 if stride == 2 else th + 2 * halo
        m = th + 2 * halo
        est = (wh * wh * (cin + (cin // 2)) + 3 * m * m * cout) * 2
        if est <= budget:
            return th
    return None


@functools.partial(jax.jit, static_argnames=(
    "count", "stride", "has_u0", "final_bn", "interpret", "th"))
def fused_block_apply(x, packed, *, count: int, stride: int,
                      has_u0: bool = True, final_bn: bool = True,
                      th: int = 0, interpret: bool = False):
    """Run one fused residual block: x [N, S, S, Cin] bf16 ->
    [N, S/stride, S/stride, Cout] bf16. Pads x internally."""
    n, s, _, cin = x.shape
    if has_u0:
        c1 = packed["w1_0"].shape[-1]
        cout = packed["w3_0"].shape[-1]
    else:
        c1 = packed["w1r"].shape[-1]
        cout = packed["w3r"].shape[-1]
    # Mosaic DMA slices need the lane (channel) dim 128-aligned: pad
    # the input channels with zeros and append matching zero input
    # rows to the first-layer weights — identical arithmetic (only
    # +0.0 terms join each contraction)
    cpad = (-cin) % 128
    out_slice = None
    if cpad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cpad)))
        packed = dict(packed)
        if has_u0:
            packed["wsc"] = jnp.pad(packed["wsc"], ((0, cpad), (0, 0)))
            packed["w1_0"] = jnp.pad(packed["w1_0"], ((0, cpad), (0, 0)))
        else:
            # a continuation chain's input is also its rolling
            # shortcut (cin == cout): pad BOTH ends with zeros so the
            # pad channels stay exactly 0 through every unit —
            # preact relu(0*0+0)=0, w1r zero in-rows contribute
            # nothing, w3r zero out-cols emit 0, 0+0 shortcut adds —
            # and slice them off the output
            assert cin == cout, (cin, cout)
            packed["ps"] = jnp.pad(packed["ps"], ((0, 0), (0, cpad)))
            packed["po"] = jnp.pad(packed["po"], ((0, 0), (0, cpad)))
            packed["w1r"] = jnp.pad(packed["w1r"],
                                    ((0, 0), (0, cpad), (0, 0)))
            packed["w3r"] = jnp.pad(packed["w3r"],
                                    ((0, 0), (0, 0), (0, cpad)))
            if final_bn:
                packed["sb"] = jnp.pad(packed["sb"], ((0, cpad),))
                packed["ob"] = jnp.pad(packed["ob"], ((0, cpad),))
            cout += cpad
            out_slice = cout - cpad
        cin += cpad
    s_out = s // stride
    u_rest = count - 1 if has_u0 else count
    halo = count if (has_u0 and stride == 1) else (
        u_rest if has_u0 else count)
    if not th:
        th = _pick_tile(s_out, stride, halo, cin, cout)
        assert th, (s_out, stride, halo)
    call, names, (pad_lo, pad_hi) = _build_block_call(
        n=n, s_in=s, s_out=s_out, cin=cin, c1=c1, cout=cout, count=count,
        stride=stride, has_u0=has_u0, final_bn=final_bn, th=th,
        interpret=interpret)
    xp = jnp.pad(x.astype(BF16),
                 ((0, 0), (pad_lo, pad_hi), (pad_lo, pad_hi), (0, 0)))
    args = [packed[nm] for nm in names]
    out = call(xp, *args)
    return out[..., :out_slice] if out_slice else out


# -------------------------------------------------------- full encoder

def fused_encoder_feats(cfg, variables, patches, interpret: bool = False):
    """Encoder forward with fused-block kernels: patches [N, S, S, 3]
    (uint8/float, 0..255) -> (d0, d1, d2, d3) pre-crop feature maps —
    the same tensors HoVerNet.__call__ computes before `conv_bot`
    (models/hovernet.py:143-152). Fast mode only (SAME stem)."""
    from flax import linen as nn

    from .blocks import ConvBNRelu, ResidualBlock

    assert cfg.mode == "fast", "fused encoder: fast mode only"
    w = cfg.width
    p, s = variables["params"], variables["batch_stats"]

    x = patches.astype(BF16) / 255.0
    stem = ConvBNRelu(w, 7, padding="SAME", dtype=BF16)
    x = stem.apply({"params": p["conv0"], "batch_stats": s["conv0"]},
                   x, train=False)

    pk_d0 = pack_block(p["d0"], s["d0"], 3)
    d0 = fused_block_apply(x, pk_d0, count=3, stride=1,
                           interpret=interpret)
    pk_d1 = pack_block(p["d1"], s["d1"], 4)
    d1 = fused_block_apply(d0, pk_d1, count=4, stride=2,
                           interpret=interpret)
    # d2 (6 units) splits 3+3 so each chunk's weights fit VMEM; the
    # rolling shortcut continues across the cut (prev feeds the tail as
    # both input and shortcut), so the cut is arithmetic-free
    pk_d2a = pack_block(p["d2"], s["d2"], 3, final_bn=False)
    d2 = fused_block_apply(d1, pk_d2a, count=3, stride=2,
                           final_bn=False, interpret=interpret)
    pk_d2b = pack_block(p["d2"], s["d2"], 3, has_u0=False, unit_base=3)
    d2 = fused_block_apply(d2, pk_d2b, count=3, stride=1, has_u0=False,
                           interpret=interpret)
    # d3: 3 units at 32^2 spatial, 13M params — weights exceed VMEM and
    # its HBM traffic is small; the standard XLA path keeps it
    rb = ResidualBlock(ch=(8 * w, 8 * w, 32 * w), count=3, stride=2,
                       dtype=BF16)
    d3 = rb.apply({"params": p["d3"], "batch_stats": s["d3"]}, d2,
                  train=False)
    return d0, d1, d2, d3


def fused_forward(cfg, variables, imgs, interpret: bool = False):
    """Full inference forward with the fused-block encoder: mirrors
    HoVerNet.__call__ (models/hovernet.py:133-185) — fused encoder,
    then conv_bot, geometric skip crops, and the standard per-branch
    decoders applied from the same variables tree. Returns the same
    {branch: logits} dict as model.apply(variables, imgs,
    train=False)."""
    from .hovernet import DecoderBranch
    from ..utils.crops import crop_op

    p, s = variables["params"], variables["batch_stats"]
    d0, d1, d2, d3 = fused_encoder_feats(cfg, variables, imgs,
                                         interpret=interpret)
    d3 = jnp.dot(d3, p["conv_bot"]["kernel"][0, 0].astype(BF16),
                 preferred_element_type=jnp.float32).astype(BF16)

    k = cfg.ksize
    td1 = (2 * (d2.shape[1] - 9 * (k - 1)), 2 * (d2.shape[2] - 9 * (k - 1)))
    td0 = (2 * (td1[0] - 5 * (k - 1)), 2 * (td1[1] - 5 * (k - 1)))
    d1 = crop_op(d1, (d1.shape[1] - td1[0], d1.shape[2] - td1[1]))
    d0 = crop_op(d0, (d0.shape[1] - td0[0], d0.shape[2] - td0[1]))

    out = {}
    for name in cfg.branches:
        br = DecoderBranch(cfg=cfg, out_ch=cfg.branch_channels(name))
        out[name] = br.apply(
            {"params": p[f"decoder_{name}"],
             "batch_stats": s[f"decoder_{name}"]},
            (d0, d1, d2, d3), train=False)
    return out
