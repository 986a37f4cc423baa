"""Blocked-VMEM post-proc kernel vs the host oracle and the scan path.

Runs in Pallas interpret mode on the CPU backend with small windows
(the TPU-compiled path is exercised by bench.py / the tile CLI on
hardware). Small core/halo keeps interpret-mode wall time sane while
still covering multi-window stitching and image-border semantics.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hover_net_tpu.metrics import get_fast_aji, remap_label
from hover_net_tpu.ops.post_proc_host import proc_np_hv
from hover_net_tpu.ops.targets import gen_instance_hv_map


def _nuclei_pred(shape, rng, n, edge_touching=False):
    inst = np.zeros(shape, np.int32)
    yy, xx = np.mgrid[-12:13, -12:13]
    lo = 3 if edge_touching else 14
    k = 1
    for _ in range(n):
        cy = int(rng.integers(lo, shape[0] - lo))
        cx = int(rng.integers(lo, shape[1] - lo))
        r = int(rng.integers(4, 11))
        m = (yy**2 + xx**2) <= r * r
        y0, y1 = max(cy - 12, 0), min(cy + 13, shape[0])
        x0, x1 = max(cx - 12, 0), min(cx + 13, shape[1])
        sub = inst[y0:y1, x0:x1]
        mm = m[(y0 - (cy - 12)):(y1 - (cy - 12)),
               (x0 - (cx - 12)):(x1 - (cx - 12))]
        sub[mm & (sub == 0)] = k
        k += 1
    hv = gen_instance_hv_map(inst, shape)
    return np.dstack([(inst > 0).astype(np.float32),
                      hv[..., 0], hv[..., 1]]).astype(np.float32)


@pytest.mark.parametrize("edge_touching", [False, True])
def test_blocked_kernel_instance_parity_vs_oracle(edge_touching):
    from hover_net_tpu.ops.post_proc_pallas import proc_np_hv_blocked

    rng = np.random.default_rng(3 if edge_touching else 0)
    pred = _nuclei_pred((160, 150), rng, 35, edge_touching)

    out = proc_np_hv_blocked(jnp.asarray(pred[None]), core=64, halo=48,
                             interpret=True)
    got = remap_label(np.asarray(out)[0])
    want = remap_label(proc_np_hv(pred))

    assert abs(int(got.max()) - int(want.max())) <= 1, \
        (got.max(), want.max())
    if want.max():
        aji = get_fast_aji(want, got)
        assert aji > 0.97, aji

    # labels leave proc_tail_blocked as UNPADDED-map linear seed
    # indices + 1 — the compact_labels_u16 binning contract (ids in
    # [0, H*W]); a regression to padded-grid indices would silently
    # alias instances after uint16 compaction on the TPU path
    raw = np.asarray(out)[0]
    assert raw.max() <= raw.size, (raw.max(), raw.shape)
    from hover_net_tpu.ops.post_proc_device import compact_labels_u16

    cmp_lab, nlab = compact_labels_u16(jnp.asarray(raw[None]))
    cmp_lab = np.asarray(cmp_lab)[0]
    assert int(np.asarray(nlab)[0]) == len(np.unique(raw)) - 1
    # compaction is a bijection of ids: same partition of pixels
    np.testing.assert_array_equal(remap_label(cmp_lab.astype(np.int32)),
                                  remap_label(raw))


def test_blocked_kernel_valid_mask_and_empty():
    from hover_net_tpu.ops.post_proc_pallas import proc_np_hv_blocked

    rng = np.random.default_rng(7)
    pred = _nuclei_pred((128, 128), rng, 20)
    valid = np.zeros((128, 128), bool)
    valid[:64, :] = True
    out = proc_np_hv_blocked(jnp.asarray(pred[None]),
                             jnp.asarray(valid[None]),
                             core=64, halo=32, interpret=True)
    lab = np.asarray(out)[0]
    assert (lab[80:, :] == 0).all()  # nothing below the valid region

    empty = np.zeros((1, 96, 96, 3), np.float32)
    out = proc_np_hv_blocked(jnp.asarray(empty), core=48, halo=24,
                             interpret=True)
    assert np.asarray(out).max() == 0
