"""HoVer-Net as a single NHWC Flax module.

Architecture parity with models/hovernet/net_desc.py in the reference:

- stem `conv0`: 7x7/64 VALID (original) or SAME (fast)  (net_desc.py:27-35)
- encoder d0..d3: Preact-ResNet50 groups [3,4,6,3], strides 1,2,2,2
  (net_desc.py:36-39)
- `conv_bot`: 1x1 2048->1024 (net_desc.py:41)
- per-branch decoders u3/u2/u1/u0 with VALID DenseBlocks, ksize 5
  (original) / 3 (fast) (net_desc.py:43-76)
- skip connections `upsample2x(d[i+1]) + crop(d[i])` with fixed crops
  184/72 (original) or 92/36 (fast) (net_desc.py:124-143)
- input scaled /255 (net_desc.py:103)
- phase-0 freeze: d0 unit towers + all of d1..d3 are detached from the
  gradient graph; conv0, d0 shortcut/blk-bn, conv_bot and decoders stay
  live (net_desc.py:106-112, net_utils.py:256-263)

TPU-first choices: NHWC layout, one compiled program per (mode, train)
pair, `width` scaling knob for cheap CI-size models, bfloat16 compute
dtype support with float32 params/batch-stats.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import (
    KAIMING_OUT,
    BN_EPS,
    BN_MOMENTUM,
    ConvBNRelu,
    DenseBlock,
    ResidualBlock,
    upsample2x,
)
from ..utils.crops import crop_op

# mode -> (input patch, output patch) (config.py:40-45, run_infer.py:145-150)
MODE_SHAPES = {"original": (270, 80), "fast": (256, 164)}
# mode -> (d0 crop, d1 crop) (net_desc.py:124-129)
MODE_CROPS = {"original": (184, 72), "fast": (92, 36)}


@dataclasses.dataclass(frozen=True)
class HoVerNetConfig:
    mode: str = "fast"
    nr_types: Optional[int] = None  # None => segmentation only (np+hv)
    input_ch: int = 3
    width: int = 64  # 64 == reference; smaller for tests
    dtype: Any = jnp.float32  # compute dtype (params stay f32)

    def __post_init__(self):
        assert self.mode in MODE_SHAPES, f"unknown mode {self.mode}"
        assert self.width % 8 == 0, "width must be a multiple of 8"

    @property
    def ksize(self) -> int:
        return 5 if self.mode == "original" else 3

    @property
    def patch_input_shape(self) -> int:
        return MODE_SHAPES[self.mode][0]

    @property
    def patch_output_shape(self) -> int:
        return MODE_SHAPES[self.mode][1]

    @property
    def branches(self) -> Tuple[str, ...]:
        # ordering matters for the inference concat contract
        # (run_desc.py:185-194): tp (if any), np, hv
        return ("np", "hv") if self.nr_types is None else ("tp", "np", "hv")

    def branch_channels(self, name: str) -> int:
        return {"np": 2, "hv": 2, "tp": self.nr_types or 0}[name]


class DecoderBranch(nn.Module):
    """u3 -> u2 -> u1 -> u0 tower for one output head (net_desc.py:43-74)."""

    cfg: HoVerNetConfig
    out_ch: int

    @nn.compact
    def __call__(self, d, train: bool):
        cfg = self.cfg
        w, k, dt = cfg.width, cfg.ksize, cfg.dtype
        d0, d1, d2, d3 = d

        # ---- u3
        x = upsample2x(d3) + d2
        x = nn.Conv(4 * w, (k, k), padding="VALID", use_bias=False,
                    kernel_init=KAIMING_OUT, dtype=dt, name="u3_conva")(x)
        x = DenseBlock(ch=(2 * w, w // 2), count=8, ksize=k, groups=4,
                       dtype=dt, name="u3_dense")(x, train)
        x = nn.Conv(8 * w, (1, 1), use_bias=False, kernel_init=KAIMING_OUT,
                    dtype=dt, name="u3_convf")(x)

        # ---- u2
        x = upsample2x(x) + d1
        x = nn.Conv(2 * w, (k, k), padding="VALID", use_bias=False,
                    kernel_init=KAIMING_OUT, dtype=dt, name="u2_conva")(x)
        x = DenseBlock(ch=(2 * w, w // 2), count=4, ksize=k, groups=4,
                       dtype=dt, name="u2_dense")(x, train)
        x = nn.Conv(4 * w, (1, 1), use_bias=False, kernel_init=KAIMING_OUT,
                    dtype=dt, name="u2_convf")(x)

        # ---- u1
        x = upsample2x(x) + d0
        x = nn.Conv(w, (k, k), padding="SAME", use_bias=False,
                    kernel_init=KAIMING_OUT, dtype=dt, name="u1_conva")(x)

        # ---- u0 (head keeps float32 for stable logits)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=dt, name="u0_bn")(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_ch, (1, 1), use_bias=True,
                    kernel_init=KAIMING_OUT, dtype=jnp.float32,
                    name="u0_conv")(x)
        return x


class HoVerNet(nn.Module):
    """Full network. Input: NHWC uint8/float RGB in [0, 255]."""

    cfg: HoVerNetConfig

    @nn.compact
    def __call__(self, imgs, train: bool = False,
                 freeze_encoder: bool = False,
                 return_feats: bool = False) -> Dict[str, jax.Array]:
        cfg = self.cfg
        w, dt = cfg.width, cfg.dtype

        x = imgs.astype(dt) / 255.0

        pad = "SAME" if cfg.mode == "fast" else "VALID"
        x = ConvBNRelu(w, 7, padding=pad, dtype=dt, name="conv0")(x, train)

        d0 = ResidualBlock(ch=(w, w, 4 * w), count=3, stride=1, dtype=dt,
                           name="d0")(x, train, freeze_units=freeze_encoder)
        d1 = ResidualBlock(ch=(2 * w, 2 * w, 8 * w), count=4, stride=2,
                           dtype=dt, name="d1")(d0, train)
        d2 = ResidualBlock(ch=(4 * w, 4 * w, 16 * w), count=6, stride=2,
                           dtype=dt, name="d2")(d1, train)
        d3 = ResidualBlock(ch=(8 * w, 8 * w, 32 * w), count=3, stride=2,
                           dtype=dt, name="d3")(d2, train)
        if freeze_encoder:
            # torch wraps d1..d3 in set_grad_enabled(False)
            # (net_desc.py:108-111): no grads to their params nor through
            # them back to d0. BN batch stats still update.
            d1 = jax.lax.stop_gradient(d1)
            d2 = jax.lax.stop_gradient(d2)
            d3 = jax.lax.stop_gradient(d3)
        d3 = nn.Conv(16 * w, (1, 1), use_bias=False, kernel_init=KAIMING_OUT,
                     dtype=dt, name="conv_bot")(d3)

        # Center-crop skips to the decoder's upsampled sizes. At the
        # canonical input sizes these equal the reference's fixed crops
        # 184/72 (original) and 92/36 (fast) (net_desc.py:124-129) —
        # asserted in tests — but computing them from the geometry keeps
        # every valid input size compilable.
        k = cfg.ksize
        td1 = (2 * (d2.shape[1] - 9 * (k - 1)), 2 * (d2.shape[2] - 9 * (k - 1)))
        td0 = (2 * (td1[0] - 5 * (k - 1)), 2 * (td1[1] - 5 * (k - 1)))
        d1 = crop_op(d1, (d1.shape[1] - td1[0], d1.shape[2] - td1[1]))
        d0 = crop_op(d0, (d0.shape[1] - td0[0], d0.shape[2] - td0[1]))

        if return_feats:
            # encoder-only apply for the fused-decoder inference path
            # (models/fused_infer.py). Never used at init time, so the
            # parameter tree is unaffected.
            return {"feats": (d0, d1, d2, d3)}

        out = {}
        for name in cfg.branches:
            out[name] = DecoderBranch(
                cfg=cfg, out_ch=cfg.branch_channels(name), name=f"decoder_{name}"
            )((d0, d1, d2, d3), train)
        return out


def create_model(mode: str = "fast", input_ch: int = 3,
                 nr_types: Optional[int] = None, width: int = 64,
                 dtype=jnp.float32) -> HoVerNet:
    """Factory mirroring net_desc.py:149-152."""
    cfg = HoVerNetConfig(mode=mode, nr_types=nr_types, input_ch=input_ch,
                         width=width, dtype=dtype)
    return HoVerNet(cfg=cfg)


def init_variables(model: HoVerNet, rng: jax.Array, batch: int = 1):
    """Initialise {params, batch_stats} with the mode's canonical input."""
    size = model.cfg.patch_input_shape
    dummy = jnp.zeros((batch, size, size, model.cfg.input_ch), jnp.float32)
    return model.init(rng, dummy, train=False)
