"""HoVer-Net building blocks as NHWC Flax modules.

Geometric/arithmetic behaviour mirrors models/hovernet/net_utils.py in the
reference (TFSamepaddingLayer:39-67 == XLA 'SAME' padding; DenseBlock:71-151;
ResidualBlock:155-266; UpSample2x:270-294) but the implementation is
TPU-first: NHWC layout, fused BN+ReLU epilogues left to XLA, nearest-neighbor
unpool expressed as a reshape-broadcast (no tensordot materialisation).

BatchNorm: eps 1e-5, running-stat momentum 0.1 (flax momentum=0.9) to match
torch defaults used by the reference.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils.crops import crop_to_shape

# torch nn.init.kaiming_normal_(mode="fan_out", nonlinearity="relu")
KAIMING_OUT = jax.nn.initializers.variance_scaling(2.0, "fan_out", "normal")

BN_EPS = 1e-5
BN_MOMENTUM = 0.9  # flax momentum = 1 - torch momentum(0.1)


class ConvBNRelu(nn.Module):
    """conv -> BN -> ReLU with VALID or SAME padding (stem `conv0`)."""

    features: int
    kernel: int
    padding: str = "VALID"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            padding=self.padding,
            use_bias=False,
            kernel_init=KAIMING_OUT,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
            name="bn",
        )(x)
        return nn.relu(x)


class ResidualUnit(nn.Module):
    """One pre-activation bottleneck unit (1x1 -> kxk SAME -> 1x1).

    The first unit of a block skips the pre-activation (the previous block
    ends with BN+ReLU already) — net_utils.py:223-226.
    """

    ch: Sequence[int]  # (c1, c2, c3)
    ksize: int = 3
    stride: int = 1
    preact: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        if self.preact:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPS,
                dtype=self.dtype,
                name="preact_bn",
            )(x)
            x = nn.relu(x)
        x = nn.Conv(
            self.ch[0], (1, 1), use_bias=False, kernel_init=KAIMING_OUT,
            dtype=self.dtype, name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM,
            epsilon=BN_EPS, dtype=self.dtype, name="conv1_bn",
        )(x)
        x = nn.relu(x)
        # TF-same padding + strided conv (net_utils.py:192-207). XLA 'SAME'
        # reproduces the asymmetric (start=pad//2) split exactly.
        x = nn.Conv(
            self.ch[1], (self.ksize, self.ksize), strides=(self.stride, self.stride),
            padding="SAME", use_bias=False, kernel_init=KAIMING_OUT,
            dtype=self.dtype, name="conv2",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM,
            epsilon=BN_EPS, dtype=self.dtype, name="conv2_bn",
        )(x)
        x = nn.relu(x)
        x = nn.Conv(
            self.ch[2], (1, 1), use_bias=False, kernel_init=KAIMING_OUT,
            dtype=self.dtype, name="conv3",
        )(x)
        return x


class ResidualBlock(nn.Module):
    """Preact-ResNet group of `count` bottleneck units.

    Mirrors net_utils.py:155-266 including the rolling-shortcut update
    (each unit's sum becomes the next unit's shortcut) and a 1x1 strided
    conv shortcut when shape changes.

    `freeze_units` detaches the unit conv towers from the gradient graph
    while leaving the shortcut conv and trailing BN live — the exact cut
    torch's `set_grad_enabled(False)` produces in net_utils.py:256-263.
    """

    ch: Sequence[int]
    count: int
    stride: int = 1
    ksize: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, freeze_units: bool = False):
        in_ch = x.shape[-1]
        if in_ch != self.ch[-1] or self.stride != 1:
            shortcut = nn.Conv(
                self.ch[-1], (1, 1), strides=(self.stride, self.stride),
                use_bias=False, kernel_init=KAIMING_OUT, dtype=self.dtype,
                name="shortcut",
            )(x)
        else:
            shortcut = x

        prev = x
        for idx in range(self.count):
            new = ResidualUnit(
                ch=self.ch,
                ksize=self.ksize,
                stride=self.stride if idx == 0 else 1,
                preact=idx != 0,
                dtype=self.dtype,
                name=f"unit{idx}",
            )(prev, train)
            if freeze_units:
                new = jax.lax.stop_gradient(new)
            prev = new + shortcut
            shortcut = prev

        out = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM,
            epsilon=BN_EPS, dtype=self.dtype, name="bn",
        )(prev)
        return nn.relu(out)


class GroupedConvAsDense(nn.Module):
    """Grouped kxk VALID conv executed as ONE dense conv.

    The parameter keeps the grouped shape (k, k, in_ch/groups, out_ch) —
    checkpoints/importers are unchanged — but at call time it is embedded
    into a block-diagonal dense kernel (k, k, in_ch, out_ch) and run as a
    regular conv. Identical arithmetic (the off-block entries are exact
    zeros), but the MXU tiles one large contraction instead of `groups`
    skinny ones: measured ~25% faster forward at the decoder's
    128->32 g=4 shapes (bs32, w64, bf16) on v5e.
    """

    features: int
    ksize: int
    groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        g = self.groups
        in_cg = in_ch // g
        out_cg = self.features // g
        k = self.ksize
        kernel = self.param(
            "kernel", KAIMING_OUT, (k, k, in_cg, self.features), jnp.float32
        )
        # out channel o = g_idx * out_cg + j sees input group g_idx
        kg = kernel.reshape(k, k, in_cg, g, out_cg)
        eye = jnp.eye(g, dtype=kernel.dtype)  # [g_in, g_out]
        dense = jnp.einsum("hwcgj,Gg->hwGcgj", kg, eye)
        dense = dense.reshape(k, k, in_ch, self.features)
        dense = dense.astype(self.dtype)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            dense,
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class DenseUnit(nn.Module):
    """BN-ReLU -> 1x1 -> BN-ReLU -> grouped kxk VALID conv (net_utils.py:93-129)."""

    ch: Sequence[int]  # (c1, c2)
    ksize: int
    groups: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM,
            epsilon=BN_EPS, dtype=self.dtype, name="preact_bn",
        )(x)
        x = nn.relu(x)
        x = nn.Conv(
            self.ch[0], (1, 1), use_bias=False, kernel_init=KAIMING_OUT,
            dtype=self.dtype, name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM,
            epsilon=BN_EPS, dtype=self.dtype, name="conv1_bn",
        )(x)
        x = nn.relu(x)
        x = GroupedConvAsDense(
            features=self.ch[1], ksize=self.ksize, groups=self.groups,
            dtype=self.dtype, name="conv2",
        )(x)
        return x


class DenseBlock(nn.Module):
    """Dense decoder block with VALID convs and center-cropped concat.

    Mirrors net_utils.py:71-151: each unit shrinks spatially by
    (ksize - 1); the running feature map is center-cropped to match before
    channel concat; closed by BN+ReLU.
    """

    ch: Sequence[int]
    count: int
    ksize: int
    groups: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        for idx in range(self.count):
            new = DenseUnit(
                ch=self.ch, ksize=self.ksize, groups=self.groups,
                dtype=self.dtype, name=f"unit{idx}",
            )(x, train)
            x = crop_to_shape(x, (new.shape[1], new.shape[2]))
            x = jnp.concatenate([x, new], axis=-1)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=BN_MOMENTUM,
            epsilon=BN_EPS, dtype=self.dtype, name="bn",
        )(x)
        return nn.relu(x)


def upsample2x(x):
    """Nearest-neighbour 2x unpool, NHWC.

    Equivalent to the reference's ones(2,2) tensordot unpool
    (net_utils.py:270-294) but expressed as broadcast+reshape so XLA lowers
    it to a pure data movement.
    """
    n, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)
