"""Fused block-diagonal decoder tower == per-branch DecoderBranch loop.

infer/steps.infer_output can run all decoder branches as ONE
block-diagonal tower (models/fused_infer.py, opt-in via HNT_FUSED_DEC=1
— measured bandwidth-bound-slower on v5e, see the module docstring);
these tests pin numerical equivalence with the per-branch towers the
checkpoints/training path define, for both modes and both typed/untyped
configs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hover_net_tpu.models import HoVerNet, HoVerNetConfig
from hover_net_tpu.models.fused_infer import fused_decoders_apply


def _perturbed_variables(model, size, seed=1):
    v = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, size, size, 3)), train=False)
    leaves, treedef = jax.tree_util.tree_flatten(v)
    ks = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    leaves = [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
              for l, k in zip(leaves, ks)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


@pytest.mark.parametrize("mode,nr_types,size", [
    ("fast", None, 256),
    ("fast", 5, 256),
    ("original", None, 270),
])
def test_fused_decoders_match_per_branch(mode, nr_types, size):
    cfg = HoVerNetConfig(mode=mode, nr_types=nr_types, width=8)
    model = HoVerNet(cfg)
    v = _perturbed_variables(model, size)
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, size, size, 3),
                           jnp.float32, 0, 255)
    ref = model.apply(v, x, train=False)
    feats = model.apply(v, x, train=False, return_feats=True)["feats"]
    fused = fused_decoders_apply(cfg, v, feats)
    for b in cfg.branches:
        r = np.asarray(ref[b])
        f = np.asarray(fused[b])
        scale = max(np.abs(r).max(), 1.0)
        np.testing.assert_allclose(f, r, atol=1e-5 * scale,
                                   err_msg=f"{mode}/{nr_types}/{b}")


def test_infer_output_fused_optin_matches_default(monkeypatch):
    """infer_output with HNT_FUSED_DEC=1 == the default per-branch
    composition."""
    from hover_net_tpu.infer.steps import infer_output

    cfg = HoVerNetConfig(mode="fast", nr_types=3, width=8)
    model = HoVerNet(cfg)
    v = _perturbed_variables(model, 256, seed=3)
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 256, 256, 3),
                           jnp.float32, 0, 255)
    monkeypatch.setenv("HNT_FUSED_DEC", "1")
    fused = np.asarray(infer_output(model, v, x))
    monkeypatch.delenv("HNT_FUSED_DEC")
    ref = np.asarray(infer_output(model, v, x))
    scale = max(np.abs(ref).max(), 1.0)
    # tp channel is an argmax -> integral; np/hv are softmax/raw heads
    np.testing.assert_allclose(fused, ref, atol=1e-5 * scale)
