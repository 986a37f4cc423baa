"""Cross-framework logit parity against the ACTUAL reference PyTorch model.

Builds /root/reference's `models.hovernet.net_desc.create_model` (torch, CPU),
randomizes its BN statistics/affines on top of its own kaiming init, exports a
reference-format `.tar` checkpoint, imports it through
`hover_net_tpu.models.checkpoints.load_torch_tar`, and asserts the Flax model
reproduces the torch logits on a fixed input for every (mode, typed) config.

This retires, in one stroke: importer name-map correctness, valid-conv and
TF-same-pad geometry, BN eps/momentum arithmetic, skip-crop splits, and the
decoder concat contract (reference net_desc.py:101-145, net_utils.py:39-294).
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"

pytestmark = [
    pytest.mark.slow,  # differential parity vs the real reference: minutes of
    # torch forwards — run with `pytest -m slow`
    pytest.mark.skipif(
        not os.path.isdir(os.path.join(REF, "models", "hovernet")),
        reason="reference checkout not available",
    ),
]


def _build_reference_model(mode, nr_types, seed):
    """Import the reference net lazily (it needs REF on sys.path for its
    `from config import Config` internal import)."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.hovernet.net_desc import create_model as ref_create_model

    torch.manual_seed(seed)
    net = ref_create_model(mode=mode, input_ch=3, nr_types=nr_types)
    net.eval()

    # Exercise the BN arithmetic properly: the default running stats are
    # (0, 1) and affines (1, 0), which would mask eps/ordering bugs.
    g = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.1, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
                m.weight.uniform_(0.5, 1.5, generator=g)
                m.bias.normal_(0.0, 0.1, generator=g)
    return net


@pytest.mark.parametrize(
    "mode,nr_types",
    [("fast", None), ("fast", 5), ("original", None), ("original", 5)],
)
def test_logit_parity_vs_reference_torch(mode, nr_types, tmp_path):
    import jax
    import jax.numpy as jnp

    from hover_net_tpu.models.hovernet import create_model, HoVerNetConfig
    from hover_net_tpu.models.checkpoints import load_torch_tar

    net = _build_reference_model(mode, nr_types, seed=7)

    # Reference-format checkpoint: {"desc": state_dict} with DataParallel
    # prefixes (run_train.py:196-203, run_utils/utils.py:15-29).
    tar = tmp_path / "net_epoch=1.tar"
    state = {"module." + k: v for k, v in net.state_dict().items()}
    torch.save({"desc": state}, str(tar))

    cfg = HoVerNetConfig(mode=mode, nr_types=nr_types)
    variables = load_torch_tar(str(tar), cfg)
    model = create_model(mode=mode, nr_types=nr_types)

    size = cfg.patch_input_shape
    rng = np.random.default_rng(3)
    img = rng.uniform(0.0, 255.0, size=(1, size, size, 3)).astype(np.float32)

    with torch.no_grad():
        ref_out = net(torch.from_numpy(img.transpose(0, 3, 1, 2)))

    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        variables, jnp.asarray(img)
    )

    assert set(out.keys()) == set(ref_out.keys())
    for name in ref_out:
        ref = ref_out[name].numpy().transpose(0, 2, 3, 1)
        got = np.asarray(out[name])
        assert got.shape == ref.shape, (name, got.shape, ref.shape)
        scale = max(1.0, float(np.abs(ref).max()))
        diff = np.abs(got - ref).max() / scale
        assert diff < 2e-4, f"{name}: rel max|delta| {diff}"
