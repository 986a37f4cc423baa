#!/usr/bin/env bash
# Reproduce the reference README's CoNSeP evaluation table
# (/root/reference/README.md:219-241) end to end with hover_net_tpu:
#
#   convert the published PyTorch checkpoint -> run typed original-mode
#   tile inference on the test images -> compute DICE / AJI / DQ / SQ /
#   PQ / AJI+ and detection F1 + per-type F1 (compute_stats.py:182-223
#   and :22-179 protocols).
#
# Usage:
#   scripts/eval_consep.sh <consep_root> <checkpoint(.tar|.msgpack)> <out_dir> [mode]
#
#   consep_root: directory holding Test/Images/*.png and Test/Labels/*.mat
#                (the official CoNSeP download layout)
#   checkpoint:  the published hovernet_original_consep_type_tf2pytorch.tar
#                (loaded directly through the torch importer) or a native
#                .msgpack checkpoint
#   mode:        original (default, matches the published README numbers)
#                or fast
#   width:       model width (default 64 = reference; smaller for smoke runs)
#
# Dry-runnable without the dataset: scripts/eval_consep_dryrun.py builds
# synthetic stand-ins with the exact same layout and calls this script.
set -euo pipefail

ROOT=${1:?consep_root}
CKPT=${2:?checkpoint}
OUT=${3:?out_dir}
MODE=${4:-original}
WIDTH=${5:-64}

HERE=$(cd "$(dirname "$0")/.." && pwd)
export PYTHONPATH="$HERE${PYTHONPATH:+:$PYTHONPATH}"

IMG_DIR="$ROOT/Test/Images"
LBL_DIR="$ROOT/Test/Labels"
[ -d "$IMG_DIR" ] || { echo "missing $IMG_DIR" >&2; exit 1; }
[ -d "$LBL_DIR" ] || { echo "missing $LBL_DIR" >&2; exit 1; }

mkdir -p "$OUT"

# CoNSeP merges types {3,4}->3 and {5,6,7}->4 (reference dataset.py:86-87)
# => 5 output classes incl. background
python -m hover_net_tpu.cli.run_infer \
    --model_path "$CKPT" --model_mode "$MODE" --nr_types 5 --width "$WIDTH" \
    --type_info_path "$HERE/type_info.json" \
    tile --input_dir "$IMG_DIR" --output_dir "$OUT"

# ground-truth .mat files need the merged type ids too; write the merged
# copies next to the predictions (idempotent)
python - "$LBL_DIR" "$OUT/true" <<'EOF'
import os
import sys

import numpy as np
import scipy.io as sio

src, dst = sys.argv[1], sys.argv[2]
os.makedirs(dst, exist_ok=True)
for name in sorted(os.listdir(src)):
    if not name.endswith(".mat"):
        continue
    m = sio.loadmat(os.path.join(src, name))
    inst = m["inst_map"].astype(np.int32)
    out = {"inst_map": inst}
    if "type_map" in m:
        t = m["type_map"].astype(np.int32)
        t[(t == 3) | (t == 4)] = 3
        t[(t == 5) | (t == 6) | (t == 7)] = 4
        out["type_map"] = t
        # per-instance type vectors for the type-stat protocol
        ids = np.unique(inst)[1:]
        cents, types = [], []
        for i in ids:
            ys, xs = np.nonzero(inst == i)
            cents.append((xs.mean(), ys.mean()))
            vals, cnts = np.unique(t[ys, xs], return_counts=True)
            types.append(int(vals[np.argmax(cnts)]))
        out["inst_centroid"] = np.asarray(cents, np.float64).reshape(-1, 2)
        out["inst_type"] = np.asarray(types, np.int32).reshape(-1, 1)
    sio.savemat(os.path.join(dst, name), out)
print(f"prepared ground truth: {dst}")
EOF

echo "== instance metrics (DICE, AJI, DQ, SQ, PQ, AJI+) =="
python -m hover_net_tpu.cli.compute_stats --mode instance \
    --pred_dir "$OUT/mat" --true_dir "$OUT/true"

echo "== type metrics (F1_det, F1 per type w=[2,2,1,1]) =="
python -m hover_net_tpu.cli.compute_stats --mode type \
    --pred_dir "$OUT/mat" --true_dir "$OUT/true"
