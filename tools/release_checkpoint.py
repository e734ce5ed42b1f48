#!/usr/bin/env python
"""Strip a checkpoint for deployment (the reference lineage's
release_model tool): drop the optimizer state (~2/3 of state.msgpack
under adam) and optionally cast float params to bfloat16 in the artifact.

Usage:
  python tools/release_checkpoint.py -model runs/ckpts -output release/
  python tools/release_checkpoint.py -model runs/ckpts/step_00004000 \
      -output release/ -dtype bfloat16

-model accepts a checkpoint directory (the newest step is released) or a
specific step_* directory. The released checkpoint decodes identically
through every decode/serve path; -train_from it restarts the optimizer
(cli/train warns).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(argv=None):
    p = argparse.ArgumentParser("vmmt-tpu release checkpoint")
    p.add_argument("-model", required=True,
                   help="checkpoint dir (newest step) or a step_* dir")
    p.add_argument("-output", required=True, help="released checkpoint dir")
    p.add_argument("-dtype", default="keep", choices=["keep", "bfloat16"],
                   help="bfloat16: cast float params in the artifact")
    p.add_argument("-ema", action="store_true",
                   help="publish the EMA (Polyak-averaged) weights as the "
                        "artifact's params (requires -ema_decay > 0 at "
                        "train time); the standard deploy for an EMA run")
    args = p.parse_args(argv)

    from variational_mmt_tpu.train.checkpoint import (latest_checkpoint,
                                                      release_checkpoint)

    src = args.model
    if not os.path.exists(os.path.join(src, "state.msgpack")):
        latest = latest_checkpoint(src)
        if latest is None:
            raise SystemExit(f"no checkpoint under {src}")
        src = latest
    info = release_checkpoint(src, args.output, dtype=args.dtype, ema=args.ema)
    mb = 1024.0 * 1024.0
    print(f"released {src} -> {args.output} "
          f"({info['src_bytes'] / mb:.1f} MB -> {info['dst_bytes'] / mb:.1f} MB, "
          f"dtype={args.dtype}, ema={args.ema})")


if __name__ == "__main__":
    main()
