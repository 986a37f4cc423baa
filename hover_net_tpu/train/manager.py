"""Training orchestrator (run_train.py parity, JAX/pjit execution).

Per phase (TrainConfig.phases): build model + optimizer, load pretrained
weights (our msgpack, a reference torch .tar via the importer, or chain
from the previous phase), wire train/valid engines + callbacks, run the
epoch loop with the jitted data-parallel train step over the device
mesh. Training is resumable: checkpoints store model + optimizer +
step, and `--resume` continues a phase from its last saved epoch (the
reference left resume as a TODO, run_train.py:176).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TrainConfig
from ..data.train_pipeline import PatchDataset, PrefetchLoader, TrainLoader
from ..models.hovernet import HoVerNet, HoVerNetConfig
from ..models import checkpoints as ckpt
from ..parallel.mesh import make_mesh, replicated
from ..parallel.train_parallel import (
    TrainState, init_train_state, make_eval_step, make_optimizer,
    make_train_step,
)
from .engine import Events, RunEngine
from . import callbacks as cb
from .validation import proc_valid_step_output, viz_train_step_output


class RunInfo:
    """Everything the callbacks need to reach the training objects."""

    def __init__(self, model, tx, lr_schedule, train_state):
        self.model = model
        self.tx = tx
        self.lr_schedule = lr_schedule
        self.train_state = train_state
        self.last_grad_norm = None

    def save_checkpoint(self, path):
        variables = {
            "params": self.train_state.params,
            "batch_stats": self.train_state.batch_stats,
        }
        extra = {"step": int(self.train_state.step)}
        ckpt.save_checkpoint(path, variables, extra=extra)
        # optimizer state alongside (separate file keeps inference loads light)
        ckpt.save_checkpoint(path + ".opt", self.train_state.opt_state)


class TrainManager:
    def __init__(self, config: TrainConfig, n_devices: Optional[int] = None):
        self.cfg = config
        self.mesh = make_mesh(n_devices)
        self.n_devices = self.mesh.devices.size

    # ----------------------------------------------------------- phases

    def run(self, resume: bool = False):
        """Run all phases. With resume=True, completed phases are
        skipped and the first incomplete phase continues from its last
        checkpoint (the reference has no training resume at all —
        run_train.py:176 TODO)."""
        np.random.seed(self.cfg.seed)
        prev_dir = None
        n_phases = len(self.cfg.phases)
        for idx, phase in enumerate(self.cfg.phases):
            save_dir = (self.cfg.log_dir if n_phases == 1
                        else os.path.join(self.cfg.log_dir, f"{idx:02d}"))
            if resume:
                last = last_checkpoint(save_dir, allow_missing=True) \
                    if os.path.isdir(save_dir) else None
                done = last is not None and int(
                    os.path.basename(last).split("=")[1].split(".")[0]
                ) >= phase.nr_epochs
                if done:
                    print(f"phase {idx}: complete ({last}), skipping")
                    prev_dir = save_dir
                    continue
                self.run_once(phase, save_dir, prev_dir, resume=True)
            else:
                self.run_once(phase, save_dir, prev_dir)
            prev_dir = save_dir

    # ------------------------------------------------------------ setup

    def _build_model(self, phase):
        mcfg = HoVerNetConfig(
            mode=self.cfg.model_mode, nr_types=self.cfg.nr_types,
            width=self.cfg.width,
        )
        return HoVerNet(mcfg)

    def _load_pretrained(self, phase, model, state: TrainState, prev_dir):
        pretrained = phase.pretrained
        if pretrained is None:
            return state
        if pretrained == -1:
            path = last_checkpoint(prev_dir)
        else:
            path = pretrained
        print(f"phase pretrained: {path}")
        if str(path).endswith((".tar", ".pth", ".pt")):
            variables = ckpt.load_torch_tar(path, model.cfg)
        elif str(path).endswith(".npz"):
            # ImageNet preact-ResNet50 encoder (or full-model TF export);
            # must cover the whole encoder or load_pretrained_npz raises
            variables = ckpt.load_pretrained_npz(path, model.cfg)
        else:
            variables, _ = ckpt.load_checkpoint(path)
        merged_p, merged_b = merge_partial(
            (state.params, state.batch_stats),
            (variables.get("params", {}), variables.get("batch_stats", {})),
        )
        return state.replace(params=merged_p, batch_stats=merged_b)

    def _get_loader(self, mode, phase):
        dirs = (self.cfg.train_dir_list if mode == "train"
                else self.cfg.valid_dir_list)
        dataset = PatchDataset(dirs)
        print(f"dataset {mode}: {len(dataset)}")
        workers = 0 if self.cfg.debug else (
            self.cfg.nr_procs_train if mode == "train" else self.cfg.nr_procs_valid
        )
        return TrainLoader(
            dataset, batch_size=phase.batch_size[mode] * self.n_devices,
            input_shape=self.cfg.act_shape, mask_shape=self.cfg.out_shape,
            mode=mode, with_type=self.cfg.type_classification,
            num_workers=workers, seed=self.cfg.seed,
        )

    # -------------------------------------------------------------- run

    def run_once(self, phase, save_dir, prev_dir=None, resume: bool = False):
        if self.cfg.logging:
            if not resume:
                if os.path.isdir(save_dir):
                    shutil.rmtree(save_dir)
            os.makedirs(save_dir, exist_ok=True)
            if not os.path.exists(f"{save_dir}/stats.json"):
                with open(f"{save_dir}/stats.json", "w") as f:
                    json.dump({}, f)
            from tensorboardX import SummaryWriter

            log_info = {
                "json_file": f"{save_dir}/stats.json",
                "tfwriter": SummaryWriter(log_dir=save_dir),
            }
        else:
            log_info = {}

        model = self._build_model(phase)
        train_loader = self._get_loader("train", phase)
        valid_loader = self._get_loader("valid", phase)

        steps_per_epoch = max(train_loader.steps_per_epoch(), 1)
        tx, schedule = make_optimizer(
            lr=phase.lr, step_epochs=phase.lr_step_epochs,
            steps_per_epoch=steps_per_epoch, gamma=phase.lr_gamma,
        )
        state = init_train_state(model, tx, jax.random.PRNGKey(self.cfg.seed))
        state = self._load_pretrained(phase, model, state, prev_dir)

        start_epoch = 0
        if resume and os.path.isdir(save_dir):
            last = last_checkpoint(save_dir, allow_missing=True)
            if last:
                variables, extra = ckpt.load_checkpoint(last)
                opt_state, _ = ckpt.load_checkpoint(
                    last + ".opt", target=state.opt_state
                )
                state = state.replace(
                    params=variables["params"],
                    batch_stats=variables["batch_stats"],
                    opt_state=opt_state,
                    step=jnp.asarray(extra.get("step", 0), jnp.int32),
                )
                start_epoch = int(
                    os.path.basename(last).split("=")[1].split(".")[0]
                )
                print(f"resumed from {last} (epoch {start_epoch})")

        state = jax.device_put(state, replicated(self.mesh))
        run_info = RunInfo(model, tx, schedule, state)

        train_step = make_train_step(
            model, tx, freeze_encoder=phase.freeze_encoder,
            loss_weights=phase.loss_weights, mesh=self.mesh,
        )
        eval_step = make_eval_step(model, mesh=self.mesh)

        nr_types = self.cfg.nr_types
        n_dev = self.n_devices

        def train_run_step(batch, engine_state):
            # batches arrive device-resident (PrefetchLoader double-
            # buffers the host->HBM transfer under the previous step)
            run_info.train_state, (terms, viz) = train_step(
                run_info.train_state, batch
            )
            ema = {k: float(v) for k, v in terms.items()}
            run_info.last_grad_norm = ema.get("grad_norm")
            # raw viz: 2 samples; device arrays converted only at epoch end
            n = min(2, batch["img"].shape[0])
            raw = {
                "img": batch["img"][:n],
                "np": (batch["np_map"][:n], viz["np"][:n]),
                "hv": (batch["hv_map"][:n], viz["hv"][:n]),
            }
            if "tp" in viz:
                raw["tp"] = (batch["tp_map"][:n], viz["tp"][:n])
            return {"EMA": ema, "raw": raw}

        def valid_run_step(batch, engine_state):
            variables = {
                "params": run_info.train_state.params,
                "batch_stats": run_info.train_state.batch_stats,
            }
            # pad the (possibly short) final batch to a device multiple
            # for the sharded eval step, slice back after
            imgs = np.asarray(batch["img"])
            n = imgs.shape[0]
            rem = (-n) % n_dev
            if rem:
                imgs = np.concatenate([imgs, imgs[-1:].repeat(rem, 0)])
            out = eval_step(variables, jnp.asarray(imgs))
            out = {k: v[:n] for k, v in out.items()}
            raw = {
                "imgs": batch["img"],
                "true_np": batch["np_map"],
                "true_hv": batch["hv_map"],
                "prob_np": np.asarray(out["prob_np"]),
                "pred_hv": np.asarray(out["pred_hv"]),
            }
            if nr_types is not None:
                raw["true_tp"] = batch["tp_map"]
                raw["pred_tp"] = np.asarray(out["pred_tp"])
            return {"raw": raw}

        train_engine = RunEngine(
            "train",
            PrefetchLoader(train_loader, self.mesh),
            train_run_step, run_info, log_info,
        )
        valid_engine = RunEngine("valid", valid_loader, valid_run_step,
                                 run_info, log_info)

        trigger = cb.TriggerEngine("valid")
        trigger.triggered_engine = valid_engine
        for event, cbs in {
            Events.STEP_COMPLETED: [cb.ScalarMovingAverage()],
            Events.EPOCH_COMPLETED: [
                cb.TrackLr(), cb.PeriodicSaver(),
                cb.VisualizeOutput(
                    lambda raw: viz_train_step_output(raw, nr_types)
                ),
                cb.LoggingEpochOutput(), trigger, cb.ScheduleLr(),
            ],
        }.items():
            for c in cbs:
                train_engine.add_event_handler(event, c)
        for event, cbs in {
            Events.STEP_COMPLETED: [cb.AccumulateRawOutput()],
            Events.EPOCH_COMPLETED: [
                cb.ProcessAccumulatedRawOutput(
                    lambda acc: proc_valid_step_output(acc, nr_types)
                ),
                cb.LoggingEpochOutput(),
                # best-valid-metric checkpoint: the reference ships this
                # callback but never wires it (callbacks/base.py:105,
                # opt.py engine spec) — here it is on by default, after
                # LoggingEpochOutput so stats.json holds this epoch
                cb.ConditionalSaver("valid-np_dice", comparator=">="),
            ],
        }.items():
            for c in cbs:
                valid_engine.add_event_handler(event, c)

        train_engine.state.logging = self.cfg.logging
        train_engine.state.log_dir = save_dir
        valid_engine.state.logging = self.cfg.logging
        valid_engine.state.log_dir = save_dir
        train_engine.state.curr_epoch = start_epoch

        train_engine.run(phase.nr_epochs - start_epoch)

        train_loader.close()
        valid_loader.close()
        return run_info


def last_checkpoint(log_dir, allow_missing=False):
    """Highest-epoch checkpoint recorded in a phase dir (the reference
    reads stats.json for this, run_train.py:164-174; we glob so resume
    works even if stats.json is missing)."""
    paths = glob.glob(f"{log_dir}/net_epoch=*.msgpack")
    if not paths:
        if allow_missing:
            return None
        raise FileNotFoundError(f"no checkpoints under {log_dir}")
    def epoch_of(p):
        return int(os.path.basename(p).split("=")[1].split(".")[0])
    return max(paths, key=epoch_of)


def merge_partial(current, incoming):
    """Load matching leaves, keep init values elsewhere; report both
    (the reference's strict=False load, run_train.py:210-215)."""
    from flax import traverse_util

    cur_p, cur_b = current
    in_p, in_b = incoming
    out = []
    for cur, inc, name in ((cur_p, in_p, "params"), (cur_b, in_b, "batch_stats")):
        cflat = traverse_util.flatten_dict(cur)
        iflat = traverse_util.flatten_dict(inc)
        missing = [k for k in cflat if k not in iflat]
        unknown = [k for k in iflat if k not in cflat]
        loaded = {}
        for k, v in cflat.items():
            if k not in iflat:
                loaded[k] = v
            elif np.shape(iflat[k]) != np.shape(v):
                raise ValueError(
                    f"pretrained shape mismatch at {'/'.join(k)}: "
                    f"{np.shape(iflat[k])} vs model {np.shape(v)}"
                )
            else:
                loaded[k] = jnp.asarray(iflat[k])
        if missing:
            print(f"missing {name} variables:", [
                "/".join(k) for k in missing[:8]
            ], "..." if len(missing) > 8 else "")
        if unknown:
            print(f"unknown {name} variables:", [
                "/".join(k) for k in unknown[:8]
            ], "..." if len(unknown) > 8 else "")
        out.append(traverse_util.unflatten_dict(loaded))
    return out[0], out[1]
