"""Pallas VMEM watershed == scan-based watershed (same fixpoint)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hover_net_tpu.ops.post_proc_device import (
    connected_components,
    watershed_flood,
)
from hover_net_tpu.ops.watershed_pallas import watershed_pallas


def make_case(rng, shape=(128, 128), n=10):
    inst = np.zeros(shape, np.int32)
    yy, xx = np.mgrid[-10:11, -10:11]
    k = 1
    for _ in range(n):
        cy = rng.integers(12, shape[0] - 12)
        cx = rng.integers(12, shape[1] - 12)
        r = rng.integers(5, 9)
        m = (yy**2 + xx**2) <= r * r
        sub = inst[cy - 10 : cy + 11, cx - 10 : cx + 11]
        sub[m & (sub == 0)] = k
        k += 1
    mask = inst > 0
    # markers: eroded cores
    core = inst.copy()
    core[:-1][np.diff(inst, axis=0) != 0] = 0
    core[:, :-1][np.diff(inst, axis=1) != 0] = 0
    markers = np.asarray(connected_components(jnp.asarray(core[None] > 0)))[0]
    energy = (rng.uniform(0, 1, shape) * 200).astype(np.int32)
    return energy, markers, mask


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_matches_scan_watershed(seed):
    rng = np.random.default_rng(seed)
    energy, markers, mask = make_case(rng)
    e = jnp.asarray(energy[None])
    m = jnp.asarray(markers[None])
    b = jnp.asarray(mask[None])
    ref = np.asarray(watershed_flood(e, m, b, 256))
    got = np.asarray(watershed_pallas(e, m, b, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_pallas_batched(seed=2):
    rng = np.random.default_rng(seed)
    cases = [make_case(rng) for _ in range(3)]
    e = jnp.asarray(np.stack([c[0] for c in cases]))
    m = jnp.asarray(np.stack([c[1] for c in cases]))
    b = jnp.asarray(np.stack([c[2] for c in cases]))
    ref = np.asarray(watershed_flood(e, m, b, 256))
    got = np.asarray(watershed_pallas(e, m, b, interpret=True))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.slow
def test_blocked_matches_scan_instance_level():
    """Block-decomposed pallas watershed on an 800x700 map: identical
    partition to the scan solve at instance level (flood paths are
    component-bounded, components < halo)."""
    from hover_net_tpu.ops.watershed_pallas import watershed_pallas_blocked
    from hover_net_tpu.metrics import remap_label, get_fast_aji

    rng = np.random.default_rng(5)
    energy, markers, mask = make_case(rng, shape=(800, 700), n=160)
    e = jnp.asarray(energy[None])
    m = jnp.asarray(markers[None])
    b = jnp.asarray(mask[None])
    ref = np.asarray(watershed_flood(e, m, b, 256))[0]
    got = np.asarray(watershed_pallas_blocked(e, m, b, interpret=True))[0]
    r = remap_label(ref)
    g = remap_label(got)
    assert r.max() == g.max(), (r.max(), g.max())
    assert get_fast_aji(r, g) > 0.999
