#!/usr/bin/env bash
# WSI inference example (reference run_wsi.sh equivalent).
set -euo pipefail

python -m hover_net_tpu.cli.run_infer \
    --nr_types 6 \
    --type_info_path type_info.json \
    --model_mode fast \
    --model_path hovernet_fast_pannuke_type_tf2pytorch.tar \
    --batch_size 64 \
    wsi \
    --input_dir dataset/sample_wsis/ \
    --output_dir dataset/sample_wsis/pred/ \
    --proc_mag 40 \
    --chunk_shape 10000 \
    --tile_shape 2048 \
    --ambiguous_size 128 \
    --save_thumb --save_mask
