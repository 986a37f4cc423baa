"""Train-step device throughput: width-64 fast mode, synthetic patches
through the real PrefetchLoader double-buffering.

    python scripts/bench_train.py [--batch 16] [--steps 30]

Reports the device step rate (host augmentation is excluded — the
patches are pre-generated; run the full training CLI to measure the
worker-pool-bound pipeline).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hover_net_tpu import runtime  # noqa: E402

runtime.setup()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from hover_net_tpu.data.train_pipeline import PrefetchLoader  # noqa: E402
from hover_net_tpu.models import HoVerNet, HoVerNetConfig  # noqa: E402
from hover_net_tpu.ops.targets import gen_targets  # noqa: E402
from hover_net_tpu.parallel.train_parallel import (  # noqa: E402
    init_train_state, make_optimizer, make_train_step,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    cfg = HoVerNetConfig(mode="fast", nr_types=None, width=64,
                         dtype=jnp.bfloat16)
    model = HoVerNet(cfg)
    tx, _ = make_optimizer(lr=1e-4, step_epochs=25, steps_per_epoch=100)
    state = init_train_state(model, tx, jax.random.PRNGKey(0), batch=1)
    step_fn = make_train_step(model, tx)

    rng = np.random.default_rng(0)
    samples = []
    for i in range(8):
        img, inst = bench.synth_nuclei_image(256, 256, seed=i, n_nuclei=70)
        t = gen_targets(inst, (164, 164))
        samples.append((img.astype(np.float32),
                        t["np_map"].astype(np.int32),
                        t["hv_map"].astype(np.float32)))

    def host_batches(n):
        for _ in range(n):
            idx = rng.integers(0, len(samples), args.batch)
            yield {
                "img": np.stack([samples[j][0] for j in idx]),
                "np_map": np.stack([samples[j][1] for j in idx]),
                "hv_map": np.stack([samples[j][2] for j in idx]),
            }

    for b in PrefetchLoader(host_batches(2), None):  # warmup/compile
        state, _ = step_fn(state, b)
    jax.block_until_ready(state.params)

    t0 = time.perf_counter()
    for b in PrefetchLoader(host_batches(args.steps), None):
        state, (terms, _) = step_fn(state, b)
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "train_samples_per_sec_per_chip",
        "value": round(args.steps * args.batch / dt, 1),
        "unit": "samples/s", "ms_per_step": round(dt / args.steps * 1e3, 1),
        "batch": args.batch,
        "final_loss": round(float(terms["overall_loss"]), 3),
    }))


if __name__ == "__main__":
    main()
