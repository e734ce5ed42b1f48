#!/usr/bin/env python
"""Average the parameters of several checkpoints into a new one (classic NMT
quality trick; cheap at this model scale). Usage:

    python tools/average_checkpoints.py -ckpts dir1 dir2 ... -output out_dir
    python tools/average_checkpoints.py -ckpt_root ckpts -last 3 -output out_dir
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

from variational_mmt_tpu.utils.platform import honor_env_platform

honor_env_platform()  # the axon plugin otherwise ignores JAX_PLATFORMS
import numpy as np


def main():
    from variational_mmt_tpu.train.checkpoint import (
        list_checkpoints,
        load_checkpoint,
        save_checkpoint,
    )

    p = argparse.ArgumentParser()
    p.add_argument("-ckpts", nargs="*", default=[], help="explicit checkpoint dirs")
    p.add_argument("-ckpt_root", default="", help="root dir holding step_* checkpoints")
    p.add_argument("-last", type=int, default=3, help="with -ckpt_root: how many newest to average")
    p.add_argument("-output", required=True)
    opt = p.parse_args()

    paths = list(opt.ckpts)
    if opt.ckpt_root:
        steps = list_checkpoints(opt.ckpt_root)[-opt.last :]
        paths += [os.path.join(opt.ckpt_root, f"step_{s:08d}") for s in steps]
    if not paths:
        raise SystemExit("no checkpoints given")

    # NEWEST checkpoint is the base: the averaged state keeps its step/lr/
    # optimizer moments (resuming from the oldest's stale metadata would
    # silently rewind the schedule)
    state, cfg, model, sv, tv = load_checkpoint(paths[-1])
    acc = jax.tree.map(lambda x: np.asarray(x, np.float64), state.params)
    for path in paths[:-1]:
        s2, cfg2, *_ = load_checkpoint(path)
        assert cfg2.model == cfg.model, f"architecture mismatch: {path}"
        acc = jax.tree.map(lambda a, b: a + np.asarray(b, np.float64), acc, s2.params)

    import jax.numpy as jnp

    avg = jax.tree.map(lambda a: jnp.asarray(a / len(paths), jnp.float32), acc)
    state = state.replace(params=avg)
    out = save_checkpoint(opt.output, state, cfg, sv, tv, keep=0)
    print(f"averaged {len(paths)} checkpoints -> {out}")


if __name__ == "__main__":
    main()
