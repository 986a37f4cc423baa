"""Checkpoint converter: reference PyTorch `.tar` -> native msgpack.

The torch->JAX analog of the reference's convert_chkpt_tf2pytorch.py
(TF->torch with a 668-row csv name map); our name map is generated from
the module structure (models/checkpoints.py).

  python -m hover_net_tpu.cli.convert_chkpt \
      --input hovernet_fast_pannuke.tar --mode fast --nr_types 6 \
      --output pannuke.msgpack
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser("hover_net_tpu.convert_chkpt")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--mode", default="fast", choices=["original", "fast"])
    p.add_argument("--nr_types", type=int, default=0)
    args = p.parse_args(argv)

    from ..models.hovernet import HoVerNetConfig
    from ..models.checkpoints import load_torch_tar, save_checkpoint

    cfg = HoVerNetConfig(
        mode=args.mode, nr_types=args.nr_types if args.nr_types > 0 else None
    )
    variables = load_torch_tar(args.input, cfg)
    save_checkpoint(args.output, variables,
                    extra={"mode": args.mode, "nr_types": args.nr_types,
                           "source": args.input})
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
