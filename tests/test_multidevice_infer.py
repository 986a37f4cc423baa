"""Multi-device (8 virtual chips) data-parallel tile inference."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hover_net_tpu.models import HoVerNet, HoVerNetConfig
from hover_net_tpu.models.checkpoints import save_checkpoint


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    cfg = HoVerNetConfig(mode="fast", nr_types=None, width=8)
    model = HoVerNet(cfg)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)), train=False
    ))()
    p = str(tmp_path_factory.mktemp("md") / "m.msgpack")
    save_checkpoint(p, variables)
    return p


def test_round_robin_devices_same_results(ckpt):
    from hover_net_tpu.infer.tile import TileInferManager

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (180, 200, 3), dtype=np.uint8)

    mgr1 = TileInferManager(model_path=ckpt, mode="fast", nr_types=None,
                            width=8, batch_size=4, dtype=jnp.float32,
                            n_devices=1)
    mgr8 = TileInferManager(model_path=ckpt, mode="fast", nr_types=None,
                            width=8, batch_size=4, dtype=jnp.float32,
                            n_devices=8)
    assert len(mgr8.devices) == 8

    outs = []
    for mgr in (mgr1, mgr8):
        handles = [mgr.predict_image_async(img) for _ in range(4)]
        outs.append([mgr.finalize_prediction(img, h) for h in handles])
    # device placement rotated (outputs on different devices)
    devs = set()
    for h in [mgr8.predict_image_async(img) for _ in range(8)]:
        devs.add(next(iter(h[1].devices())))
    assert len(devs) == 8

    for (p1, i1, _), (p8, i8, _) in zip(outs[0], outs[1]):
        np.testing.assert_allclose(p1, p8, atol=1e-5)
        np.testing.assert_array_equal(i1, i8)
