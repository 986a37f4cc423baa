"""Inference CLI (run_infer.py parity: tile / wsi subcommands).

Examples:
  python -m hover_net_tpu.cli.run_infer \
      --model_path ckpt.msgpack --model_mode fast --nr_types 6 \
      --type_info_path type_info.json \
      tile --input_dir in/ --output_dir out/ --save_qupath

  python -m hover_net_tpu.cli.run_infer \
      --model_path ckpt.msgpack --model_mode fast --nr_types 6 \
      wsi --input_dir slides/ --output_dir out/ --proc_mag 40

Reference PyTorch `.tar` checkpoints load directly via the importer.
Flags accepted for compatibility but without effect here are documented
inline (worker counts: patching/post-proc run on device).
"""

from __future__ import annotations

import argparse
import logging


def build_parser():
    p = argparse.ArgumentParser("hover_net_tpu.run_infer")
    p.add_argument("--nr_types", type=int, default=0,
                   help="number of nuclei types (0 = segmentation only)")
    p.add_argument("--type_info_path", default=None)
    p.add_argument("--model_path", required=True)
    p.add_argument("--model_mode", default="fast", choices=["original", "fast"])
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--nr_inference_workers", type=int, default=8,
                   help="accepted for parity; patch I/O is device-side")
    p.add_argument("--nr_post_proc_workers", type=int, default=0,
                   help="accepted for parity; post-proc runs on device")
    p.add_argument("--host_post_proc", action="store_true",
                   help="use the host (cv2/scipy) post-proc oracle path")
    p.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler device trace of the run "
                        "(view in TensorBoard)")
    p.add_argument("--n_devices", type=int, default=1,
                   help="tile mode: round-robin images across this many "
                        "chips (data-parallel inference)")

    sub = p.add_subparsers(dest="command", required=True)

    tile = sub.add_parser("tile")
    tile.add_argument("--input_dir", required=True)
    tile.add_argument("--output_dir", required=True)
    tile.add_argument("--mem_usage", type=float, default=0.2,
                      help="accepted for parity; streaming pipeline "
                           "caches one image at a time")
    tile.add_argument("--draw_dot", action="store_true")
    tile.add_argument("--save_qupath", action="store_true")
    tile.add_argument("--save_raw_map", action="store_true")
    tile.add_argument("--save_format", default="all",
                      choices=["all", "json"],
                      help="'all' writes the full reference contract "
                           "(mat/overlay/json); 'json' writes only the "
                           "per-nucleus json (+qupath if requested) — "
                           "skips the dense instance-map device->host "
                           "pull and the mat/overlay encodes (the "
                           "high-throughput production config)")

    wsi = sub.add_parser("wsi")
    wsi.add_argument("--input_dir", required=True)
    wsi.add_argument("--output_dir", required=True)
    wsi.add_argument("--input_mask_dir", default=None)
    wsi.add_argument("--cache_path", default="cache")
    wsi.add_argument("--proc_mag", type=int, default=40)
    wsi.add_argument("--ambiguous_size", type=int, default=128)
    wsi.add_argument("--chunk_shape", type=int, default=10000)
    wsi.add_argument("--tile_shape", type=int, default=2048)
    wsi.add_argument("--save_thumb", action="store_true")
    wsi.add_argument("--save_mask", action="store_true")
    wsi.add_argument("--pred_map_f32", action="store_true",
                     help="store the stitched prediction mmap in float32 "
                          "(the reference's dtype) instead of the default "
                          "float16 (half the disk/transfer volume)")
    wsi.add_argument("--hbm_pred_budget_gb", type=float, default=4.0,
                     help="keep the stitched prediction map resident in "
                          "device HBM when it fits this budget (no mmap "
                          "round trip); 0 forces the mmap path")
    return p


def main(argv=None):
    from .. import runtime

    runtime.setup()
    args = build_parser().parse_args(argv)
    logging.basicConfig(
        level=logging.INFO,
        format="|%(asctime)s.%(msecs)03d| [%(levelname)s] %(message)s",
        datefmt="%Y-%m-%d|%H:%M:%S",
        handlers=[logging.FileHandler("debug.log"), logging.StreamHandler()],
    )
    nr_types = args.nr_types if args.nr_types > 0 else None
    common = dict(
        model_path=args.model_path, mode=args.model_mode, nr_types=nr_types,
        type_info_path=args.type_info_path, batch_size=args.batch_size,
        width=args.width,
    )
    with runtime.profile_trace(args.profile_dir):
        if args.command == "tile":
            from ..infer.tile import TileInferManager

            mgr = TileInferManager(
                device_post_proc=not args.host_post_proc,
                n_devices=args.n_devices, **common
            )
            mgr.process_file_list(
                args.input_dir, args.output_dir, draw_dot=args.draw_dot,
                save_qupath=args.save_qupath, save_raw_map=args.save_raw_map,
                save_format=args.save_format,
            )
        else:
            from ..infer.wsi import WSIInferManager

            mgr = WSIInferManager(
                chunk_shape=args.chunk_shape, tile_shape=args.tile_shape,
                ambiguous_size=args.ambiguous_size, proc_mag=args.proc_mag,
                cache_path=args.cache_path, n_devices=args.n_devices,
                pred_map_dtype="float32" if args.pred_map_f32 else "float16",
                hbm_pred_budget=int(args.hbm_pred_budget_gb * 2**30),
                **common,
            )
            mgr.process_wsi_list(
                args.input_dir, args.output_dir,
                input_mask_dir=args.input_mask_dir,
                save_thumb=args.save_thumb, save_mask=args.save_mask,
            )


if __name__ == "__main__":
    main()
