"""Pallas TPU kernel: VMEM-resident marker watershed for small windows.

The scan-based watershed (post_proc_device.watershed_flood) round-trips
HBM on every directional scan. For windows that fit VMEM (<= ~512^2:
3 int32 arrays + temporaries ~ 4-6 MB), this kernel keeps (cost, label)
in VMEM and runs the whole 4-neighbour relaxation to fixpoint inside
one kernel — each sweep is pure VPU work with zero HBM traffic.

Cost packing and tie-breaking semantics are identical to
watershed_flood (packed (level << HOP_BITS) | hops words, label-min
ties), so both paths converge to the same minimax-path fixpoint;
equality is asserted in tests/test_watershed_pallas.py.

Grid: one program per batch element. Intended consumers: the WSI
boundary-strip / cross windows (256x2048 strips are processed by the
scan path; 512^2 crosses and small tiles fit here).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .post_proc_device import HOP_BITS, INT_MAX, cross_cost


def _shifted(x, dy, dx, fill):
    if dy == -1:
        x = jnp.concatenate([x[1:], jnp.full_like(x[:1], fill)], axis=0)
    elif dy == 1:
        x = jnp.concatenate([jnp.full_like(x[:1], fill), x[:-1]], axis=0)
    if dx == -1:
        x = jnp.concatenate([x[:, 1:], jnp.full_like(x[:, :1], fill)], axis=1)
    elif dx == 1:
        x = jnp.concatenate([jnp.full_like(x[:, :1], fill), x[:, :-1]], axis=1)
    return x


def _cost_sweep(cost, energy_sh, mask):
    """One synchronous 4-neighbour cost relaxation step (VPU only)."""
    best_c = cost
    for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        q_c = _shifted(cost, dy, dx, INT_MAX)
        best_c = jnp.minimum(best_c, cross_cost(q_c, energy_sh))
    return jnp.where(mask, best_c, cost)


def _label_sweep(sec, lab, cost, energy_sh, mask):
    """(total hops, label) minimisation along optimal (cost-attaining)
    edges — the canonical tie resolution of watershed_flood."""
    best_s, best_l = sec, lab
    for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        q_c = _shifted(cost, dy, dx, INT_MAX)
        q_s = _shifted(best_s, dy, dx, INT_MAX)
        q_l = _shifted(best_l, dy, dx, 0)
        has = (q_l > 0) & (q_c != INT_MAX) & (q_s != INT_MAX)
        offer = has & (cross_cost(q_c, energy_sh) == cost)
        s_c = jnp.where(offer, q_s + 1, INT_MAX)
        take = offer & ((s_c < best_s) | ((s_c == best_s) & (q_l < best_l)))
        best_s = jnp.where(take, s_c, best_s)
        best_l = jnp.where(take, q_l, best_l)
    return jnp.where(mask, best_s, sec), jnp.where(mask, best_l, lab)


def _kernel(energy_ref, markers_ref, mask_ref, lab_out_ref):
    energy_sh = energy_ref[0] << HOP_BITS
    markers = markers_ref[0]
    mask = mask_ref[0] > 0

    seeded = (markers > 0) & mask
    lab0 = jnp.where(seeded, markers, 0)
    cost0 = jnp.where(seeded, energy_sh, INT_MAX)

    def cost_body(state):
        cost, _ = state
        nc = _cost_sweep(cost, energy_sh, mask)
        return nc, jnp.any(nc != cost)

    cost, _ = jax.lax.while_loop(
        lambda s: s[1], cost_body, (cost0, jnp.bool_(True))
    )

    sec0 = jnp.where(seeded, 0, INT_MAX)

    def lab_body(state):
        sec, lab, _ = state
        ns, nb = _label_sweep(sec, lab, cost, energy_sh, mask)
        return ns, nb, jnp.any(nb != lab) | jnp.any(ns != sec)

    _, lab, _ = jax.lax.while_loop(
        lambda s: s[2], lab_body, (sec0, lab0, jnp.bool_(True))
    )
    lab_out_ref[0] = jnp.where(mask, lab, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def watershed_pallas(energy_q, markers, mask, interpret: bool = False):
    """[N,H,W] quantised energy/markers/mask -> [N,H,W] int32 labels.

    Same fixpoint as post_proc_device.watershed_flood; requires the
    per-window arrays to fit VMEM (H*W <= ~512*512).
    """
    n, h, w = energy_q.shape
    grid = (n,)
    spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.int32),
        interpret=interpret,
    )(energy_q.astype(jnp.int32), markers.astype(jnp.int32),
      mask.astype(jnp.int32))


@functools.partial(jax.jit,
                   static_argnames=("core", "halo", "interpret"))
def watershed_pallas_blocked(energy_q, markers, mask, core: int = 320,
                             halo: int = 96, interpret: bool = False):
    """Block-decomposed VMEM watershed for maps larger than one window.

    The map is cut into `core`-sized blocks, each read with a `halo`
    margin ((core + 2*halo)^2 must fit VMEM). Because flooding is
    restricted to the nuclei mask, a pixel's flood path to its marker
    is bounded by its connected component's extent — so any component
    smaller than `halo` is labelled identically to the global solve,
    with no cross-block merge step. Components larger than `halo`
    (rare merged clumps) may split at block seams; instance-level
    parity vs the scan path is the tested contract.

    Window gathering happens in XLA (dynamic-slice stack, ~(1+2h/c)^2
    HBM duplication); the per-window flood runs in VMEM.
    """
    n, h, w = energy_q.shape
    win = core + 2 * halo
    nby = -(-h // core)
    nbx = -(-w // core)
    pad_h = nby * core + 2 * halo - h
    pad_w = nbx * core + 2 * halo - w

    def pad(x, fill):
        return jnp.pad(x, ((0, 0), (halo, pad_h - halo), (halo, pad_w - halo)),
                       constant_values=fill)

    e_p = pad(energy_q.astype(jnp.int32), 0)
    m_p = pad(markers.astype(jnp.int32), 0)
    b_p = pad(mask.astype(jnp.int32), 0)

    # gather overlapping windows: [n*nby*nbx, win, win]
    offs_y = jnp.arange(nby) * core
    offs_x = jnp.arange(nbx) * core

    def windows(x):
        def per_sample(xs):
            def per_y(oy):
                def per_x(ox):
                    return jax.lax.dynamic_slice(xs, (oy, ox), (win, win))
                return jax.vmap(per_x)(offs_x)
            return jax.vmap(per_y)(offs_y)
        return jax.vmap(per_sample)(x).reshape(n * nby * nbx, win, win)

    lab_win = watershed_pallas(windows(e_p), windows(m_p), windows(b_p),
                               interpret=interpret)
    # take cores, reassemble
    cores = lab_win[:, halo : halo + core, halo : halo + core]
    cores = cores.reshape(n, nby, nbx, core, core).transpose(0, 1, 3, 2, 4)
    out = cores.reshape(n, nby * core, nbx * core)[:, :h, :w]
    return jnp.where(mask, out, 0)
