"""Multi-chip (virtual 8-device CPU mesh) train/eval step tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hover_net_tpu.models import HoVerNet, HoVerNetConfig
from hover_net_tpu.parallel.mesh import make_mesh, replicated, shard_batch
from hover_net_tpu.parallel.train_parallel import (
    dryrun_train_step,
    init_train_state,
    make_optimizer,
    make_train_step,
)


def test_dryrun_8_devices():
    assert len(jax.devices()) == 8, "conftest should force 8 CPU devices"
    dryrun_train_step(8)


def test_sharded_step_matches_single_device():
    """Same batch, 1-device vs 8-device mesh -> same loss (DP is pure
    math reshuffling; global-batch BN keeps them identical)."""
    cfg = HoVerNetConfig(mode="fast", nr_types=None, width=8)
    model = HoVerNet(cfg)
    tx, _ = make_optimizer(steps_per_epoch=10)

    rng = np.random.default_rng(0)
    batch = {
        "img": rng.uniform(0, 255, (8, 96, 96, 3)).astype(np.float32),
        "np_map": (rng.uniform(0, 1, (8, 4, 4)) > 0.5).astype(np.int32),
        "hv_map": rng.uniform(-1, 1, (8, 4, 4, 2)).astype(np.float32),
    }

    losses = {}
    for n_dev in (1, 8):
        mesh = make_mesh(n_dev)
        state = init_train_state(model, tx, jax.random.PRNGKey(0), batch=1)
        with mesh:
            state = jax.device_put(state, replicated(mesh))
            dev_batch = shard_batch(mesh, batch)
            step = make_train_step(model, tx, mesh=mesh)
            _, (terms, _viz) = step(state, dev_batch)
            losses[n_dev] = float(terms["overall_loss"])
    np.testing.assert_allclose(losses[1], losses[8], rtol=1e-4)


def test_train_step_learns_on_tiny_batch():
    """Loss decreases over a few steps on a fixed batch."""
    cfg = HoVerNetConfig(mode="fast", nr_types=None, width=8)
    model = HoVerNet(cfg)
    tx, _ = make_optimizer(lr=1e-3, steps_per_epoch=10)
    state = init_train_state(model, tx, jax.random.PRNGKey(0), batch=1)

    rng = np.random.default_rng(1)
    batch = {
        "img": rng.uniform(0, 255, (2, 96, 96, 3)).astype(np.float32),
        "np_map": (rng.uniform(0, 1, (2, 4, 4)) > 0.5).astype(np.int32),
        "hv_map": rng.uniform(-1, 1, (2, 4, 4, 2)).astype(np.float32),
    }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    step = make_train_step(model, tx)
    first = None
    for i in range(8):
        state, (terms, _viz) = step(state, batch)
        if first is None:
            first = float(terms["overall_loss"])
    last = float(terms["overall_loss"])
    assert last < first, (first, last)
