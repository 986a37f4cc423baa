"""Fused-block Pallas encoder (models/encoder_pallas.py) equivalence
vs the standard Flax path — interpret mode on CPU.

Tolerances are bf16-scale: the kernel folds each inference BatchNorm
into a per-channel (scale, offset) pair (f32-folded, bf16-applied),
which rounds differently from flax's (x - mean) * rsqrt(var + eps)
chain in bf16 — a ~2-ulp drift per block on bf16 activations. The
geometry (halos, SAME masking, stride-2 phases, rolling shortcut) is
exact: the single-tile and multi-tile results must agree bit-for-bit
with each other, which is asserted below (a halo/mask bug breaks that
long before it breaks the loose XLA comparison).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hover_net_tpu.models.blocks import ResidualBlock
from hover_net_tpu.models.encoder_pallas import (
    fused_block_apply,
    fused_forward,
    pack_block,
)


def _mk_block(count, stride, cin, c1, cout, S, seed=0):
    rb = ResidualBlock(ch=(c1, c1, cout), count=count, stride=stride,
                       dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(seed), (2, S, S, cin),
                          jnp.float32)
    v = rb.init(jax.random.PRNGKey(seed + 1), x, train=False)
    v = jax.tree.map(
        lambda a: a + 0.1 * jax.random.normal(
            jax.random.PRNGKey(a.size % 997), a.shape, a.dtype), v)
    return rb, v, x


@pytest.mark.parametrize("count,stride,cin,c1,cout,S,th", [
    (3, 1, 16, 16, 64, 64, 32),    # d0 shape class, 2x2 tiles
    (4, 2, 64, 32, 128, 64, 16),   # d1 shape class, stride 2
])
def test_fused_block_matches_flax(count, stride, cin, c1, cout, S, th):
    rb, v, x = _mk_block(count, stride, cin, c1, cout, S)
    ref = np.asarray(rb.apply(v, x.astype(jnp.bfloat16), train=False),
                     np.float32)
    pk = pack_block(v["params"], v["batch_stats"], count)
    out = np.asarray(
        fused_block_apply(x.astype(jnp.bfloat16), pk, count=count,
                          stride=stride, th=th, interpret=True),
        np.float32)
    assert out.shape == ref.shape
    scale = np.abs(ref).max()
    assert np.abs(ref - out).max() < 0.03 * scale, (
        np.abs(ref - out).max(), scale)


def test_fused_block_tiling_exact():
    """Multi-tile result must equal the single-tile solve bit-for-bit:
    pins halo windows + SAME-boundary masking with zero numeric
    slack (both run the identical in-kernel arithmetic)."""
    rb, v, x = _mk_block(3, 1, 16, 16, 64, 64)
    pk = pack_block(v["params"], v["batch_stats"], 3)
    one = np.asarray(fused_block_apply(
        x.astype(jnp.bfloat16), pk, count=3, stride=1, th=64,
        interpret=True))
    four = np.asarray(fused_block_apply(
        x.astype(jnp.bfloat16), pk, count=3, stride=1, th=32,
        interpret=True))
    np.testing.assert_array_equal(one, four)


def test_fused_block_split_chain_exact():
    """Splitting a block into u0-chunk + continuation (the d2 3+3 cut)
    must reproduce the unsplit fused solve exactly — the rolling
    shortcut crosses the cut arithmetic-free."""
    rb, v, x = _mk_block(6, 2, 32, 16, 64, 32, seed=3)
    pk_full = pack_block(v["params"], v["batch_stats"], 6)
    full = np.asarray(fused_block_apply(
        x.astype(jnp.bfloat16), pk_full, count=6, stride=2, th=16,
        interpret=True))
    pk_a = pack_block(v["params"], v["batch_stats"], 3, final_bn=False)
    pk_b = pack_block(v["params"], v["batch_stats"], 3, has_u0=False,
                      unit_base=3)
    half = fused_block_apply(x.astype(jnp.bfloat16), pk_a, count=3,
                             stride=2, final_bn=False, th=16,
                             interpret=True)
    out = np.asarray(fused_block_apply(half, pk_b, count=3, stride=1,
                                       has_u0=False, th=16,
                                       interpret=True))
    np.testing.assert_array_equal(full, out)


def test_fused_forward_matches_model():
    """Whole-net: fused-encoder forward vs model.apply on a 256^2
    patch (w16). Random-init BN stats inflate activations to O(1e3)
    (bf16 ulp ~8 at that scale, compounding through 4 blocks + the
    decoders), so the bound is a loose 10% of the logit scale — the
    per-block tests above carry the tight numeric pin, and
    scripts/check_fused_encoder.py measures the trained-weight drift
    on TPU."""
    from hover_net_tpu.models import HoVerNet, HoVerNetConfig

    cfg = HoVerNetConfig(mode="fast", nr_types=None, width=16,
                         dtype=jnp.bfloat16)
    model = HoVerNet(cfg)
    x = jax.random.randint(jax.random.PRNGKey(1), (1, 256, 256, 3),
                           0, 255).astype(jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 256, 256, 3)), train=False)
    ref = model.apply(variables, x, train=False)
    out = fused_forward(cfg, variables, x, interpret=True)
    for k in ref:
        r = np.asarray(ref[k], np.float32)
        o = np.asarray(out[k], np.float32)
        assert o.shape == r.shape
        scale = np.abs(r).max()
        assert np.abs(r - o).max() < 0.10 * scale, (
            k, np.abs(r - o).max(), scale)
