"""Dry-run of scripts/eval_consep.sh on synthetic stand-ins.

Builds a miniature CoNSeP-layout dataset (Test/Images/*.png +
Test/Labels/*.mat with inst_map/type_map in the raw 0..7 type ids) and
a tiny random checkpoint, then executes the real eval script end to
end. The day the actual data + published `.tar` arrive, the SAME
command reproduces the reference README table:

    scripts/eval_consep.sh /data/CoNSeP hovernet_original_consep_type_tf2pytorch.tar out/

Run:  python scripts/eval_consep_dryrun.py [workdir]
"""

import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_standins(root, n_images=2, size=180, seed=0):
    import cv2
    import scipy.io as sio

    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "Test", "Images")
    lbl_dir = os.path.join(root, "Test", "Labels")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lbl_dir, exist_ok=True)
    yy, xx = np.mgrid[-10:11, -10:11]
    for i in range(n_images):
        img = np.full((size, size, 3), 225, np.float32)
        img += rng.normal(0, 4, img.shape)
        inst = np.zeros((size, size), np.int32)
        tmap = np.zeros((size, size), np.int32)
        k = 1
        for _ in range(25):
            cy = int(rng.integers(12, size - 12))
            cx = int(rng.integers(12, size - 12))
            r = int(rng.integers(4, 9))
            m = (yy**2 + xx**2) <= r * r
            sub = inst[cy - 10 : cy + 11, cx - 10 : cx + 11]
            tsub = tmap[cy - 10 : cy + 11, cx - 10 : cx + 11]
            paint = m & (sub == 0)
            sub[paint] = k
            tsub[paint] = int(rng.integers(1, 8))  # raw CoNSeP ids 1..7
            k += 1
            col = np.array([120, 70, 150]) + rng.normal(0, 10, 3)
            img[cy - 10 : cy + 11, cx - 10 : cx + 11][m] = col
        cv2.imwrite(
            os.path.join(img_dir, f"test_{i}.png"),
            cv2.cvtColor(np.clip(img, 0, 255).astype(np.uint8),
                         cv2.COLOR_RGB2BGR),
        )
        sio.savemat(
            os.path.join(lbl_dir, f"test_{i}.mat"),
            {"inst_map": inst, "type_map": tmap},
        )


def build_checkpoint(path, mode="fast"):
    import jax
    import jax.numpy as jnp

    from hover_net_tpu.models import HoVerNet, HoVerNetConfig
    from hover_net_tpu.models.checkpoints import save_checkpoint

    cfg = HoVerNetConfig(mode=mode, nr_types=5, width=8)
    model = HoVerNet(cfg)
    size = cfg.patch_input_shape
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, size, size, 3)), train=False)
    )()
    save_checkpoint(path, variables)


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="consep_dryrun_")
    root = os.path.join(work, "CoNSeP")
    out = os.path.join(work, "out")
    ckpt = os.path.join(work, "tiny.msgpack")
    build_standins(root)
    # width-8 fast mode: geometrically identical, quick on any backend
    build_checkpoint(ckpt, mode="fast")
    script = os.path.join(os.path.dirname(__file__), "eval_consep.sh")
    subprocess.run(
        ["bash", script, root, ckpt, out, "fast", "8"], check=True
    )
    print(f"dry run complete: {out}")


if __name__ == "__main__":
    main()
