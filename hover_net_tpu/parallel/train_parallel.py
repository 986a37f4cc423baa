"""Data-parallel training step (jit + NamedSharding over a 1-D mesh).

Semantics match run_desc.py:12-109 in the reference: NHWC forward in
train mode, softmaxed NP/TP heads, one-hot targets, 4/6-term weighted
loss, Adam update. Differences that are deliberate TPU-first upgrades:

- gradients are averaged across the mesh by XLA (the pjit analog of
  DataParallel's gather);
- BatchNorm batch statistics are computed over the GLOBAL batch (XLA
  inserts the cross-replica mean), unlike DataParallel's per-GPU stats —
  strictly more correct at the same global batch size;
- loss scalars stay on device; no per-term `.item()` sync points
  (run_desc.py:76 syncs host<->GPU once per loss term per step).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.hovernet import HoVerNet, HoVerNetConfig
from ..ops.losses import hovernet_loss
from .mesh import batch_sharding, make_mesh, replicated, shard_batch


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(lr: float = 1.0e-4, step_epochs: int = 25,
                   steps_per_epoch: int = 1, gamma: float = 0.1):
    """Adam(lr, betas 0.9/0.999) + StepLR(25 epochs, x0.1)
    (opt.py:37-45)."""
    boundaries = {step_epochs * steps_per_epoch: gamma}
    schedule = optax.piecewise_constant_schedule(lr, boundaries)
    return optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(schedule),
    ), schedule


def init_train_state(model: HoVerNet, tx, rng, batch: int = 2) -> TrainState:
    size = model.cfg.patch_input_shape
    dummy = jnp.zeros((batch, size, size, 3), jnp.float32)
    variables = model.init(rng, dummy, train=False)
    return TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(model: HoVerNet, tx, freeze_encoder: bool = False,
                    loss_weights: Optional[dict] = None, mesh=None):
    """Returns jitted (state, batch) -> (state, metrics).

    batch: img [N,H,W,3] float (0..255), np_map [N,h,w] int,
    hv_map [N,h,w,2] float, tp_map [N,h,w] int (optional).
    """
    nr_types = model.cfg.nr_types

    def step_fn(state: TrainState, batch: Dict[str, jax.Array]):
        true_np_onehot = jax.nn.one_hot(batch["np_map"].astype(jnp.int32), 2)
        true = {"np": true_np_onehot, "hv": batch["hv_map"].astype(jnp.float32)}
        if nr_types is not None:
            true["tp"] = jax.nn.one_hot(batch["tp_map"].astype(jnp.int32), nr_types)

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["img"], train=True, freeze_encoder=freeze_encoder,
                mutable=["batch_stats"],
            )
            pred = {
                "np": jax.nn.softmax(out["np"].astype(jnp.float32), axis=-1),
                "hv": out["hv"].astype(jnp.float32),
            }
            if nr_types is not None:
                pred["tp"] = jax.nn.softmax(out["tp"].astype(jnp.float32), axis=-1)
            total, terms = hovernet_loss(
                pred, true, true_np_onehot[..., 1], weights=loss_weights
            )
            # 2-sample prediction snapshots for the epoch viz panel
            # (run_desc.py:87-108); tiny, stays on device until pulled
            viz = {"np": pred["np"][:2, ..., 1], "hv": pred["hv"][:2]}
            if "tp" in pred:
                viz["tp"] = jnp.argmax(pred["tp"][:2], axis=-1)
            return total, (terms, mutated["batch_stats"], viz)

        grads, (terms, new_stats, viz) = jax.grad(
            loss_fn, has_aux=True
        )(state.params)
        terms["grad_norm"] = optax.global_norm(grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params, batch_stats=new_stats, opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, (terms, viz)

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))
    rep = replicated(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(rep, data),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def make_eval_step(model: HoVerNet, mesh=None):
    """Validation forward (run_desc.py:113-167 contract): returns
    prob_np [N,h,w], pred_hv, pred_tp (argmax) if typed."""
    nr_types = model.cfg.nr_types

    def step_fn(variables, imgs):
        out = model.apply(variables, imgs, train=False)
        res = {
            "prob_np": jax.nn.softmax(out["np"].astype(jnp.float32), -1)[..., 1],
            "pred_hv": out["hv"].astype(jnp.float32),
        }
        if nr_types is not None:
            res["pred_tp"] = jnp.argmax(out["tp"], axis=-1).astype(jnp.float32)
        return res

    if mesh is None:
        return jax.jit(step_fn)
    rep = replicated(mesh)
    data = batch_sharding(mesh)
    return jax.jit(step_fn, in_shardings=(rep, data), out_shardings=data)


# ----------------------------------------------------------------- dryrun

def dryrun_train_step(n_devices: int) -> None:
    """One sharded train step on tiny shapes over an n-device mesh.

    Used by the driver (and tests) to validate the multi-chip path
    compiles and executes. Uses the real step: full model graph (tiny
    width), 4-term loss, Adam, BN stat update.

    Runs on a virtual CPU mesh per the driver contract (the flag/config
    switch must happen before the first backend query, so don't call
    jax.devices() before this function).
    """
    import os

    import numpy as np

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass  # backend already initialised; use whatever devices exist
    assert len(jax.devices()) >= n_devices, (
        f"need {n_devices} devices; got {jax.devices()} — set "
        "XLA_FLAGS=--xla_force_host_platform_device_count before jax init"
    )

    mesh = make_mesh(n_devices)
    cfg = HoVerNetConfig(mode="fast", nr_types=5, width=8)
    model = HoVerNet(cfg)
    tx, _ = make_optimizer(steps_per_epoch=10)
    state = init_train_state(model, tx, jax.random.PRNGKey(0), batch=1)

    # tiny valid geometry for fast mode: 96 -> 4 (see tests/test_model.py)
    n = n_devices
    rng = np.random.default_rng(0)
    batch = {
        "img": rng.uniform(0, 255, (n, 96, 96, 3)).astype(np.float32),
        "np_map": (rng.uniform(0, 1, (n, 4, 4)) > 0.5).astype(np.int32),
        "hv_map": rng.uniform(-1, 1, (n, 4, 4, 2)).astype(np.float32),
        "tp_map": rng.integers(0, 5, (n, 4, 4)).astype(np.int32),
    }
    with mesh:
        state = jax.device_put(state, replicated(mesh))
        dev_batch = shard_batch(mesh, batch)
        step = make_train_step(model, tx, freeze_encoder=False, mesh=mesh)
        new_state, (terms, _viz) = step(state, dev_batch)
        jax.block_until_ready(new_state.params)
    loss = float(terms["overall_loss"])
    assert jnp.isfinite(loss), "non-finite loss in dryrun"
    print(f"dryrun_multichip ok: {n_devices} devices, loss={loss:.4f}")
