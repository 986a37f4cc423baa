#!/usr/bin/env bash
# Tile inference example (reference run_tile.sh equivalent).
set -euo pipefail

python -m hover_net_tpu.cli.run_infer \
    --nr_types 6 \
    --type_info_path type_info.json \
    --model_mode fast \
    --model_path hovernet_fast_pannuke_type_tf2pytorch.tar \
    --batch_size 64 \
    tile \
    --input_dir dataset/sample_tiles/imgs/ \
    --output_dir dataset/sample_tiles/pred/ \
    --save_qupath
