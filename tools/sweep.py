#!/usr/bin/env python
"""Hyperparameter sweep harness (SURVEY.md §7 "hard parts": BLEU parity with
unverified reference hyperparameters requires a small sweep; cheap because a
full Multi30k train is <10 min on a v5e-8).

Usage:
    python tools/sweep.py -data prefix -train_img_feats f.npy ... \
        -sweep "model.latent_dim=32,128,256 train.learning_rate=2e-4,4e-4"

Runs the cartesian product of dotted-config overrides, each as a short
train + validation (and optional greedy-BLEU on the valid set), and prints
a ranked table. Results are also appended to sweep_results.jsonl.
"""

import argparse
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def parse_sweep(spec: str):
    axes = []
    for part in spec.split():
        key, vals = part.split("=", 1)
        axes.append([(key, v) for v in vals.split(",")])
    return [dict(combo) for combo in itertools.product(*axes)]


def main():
    import jax  # noqa: F401 — imported so the compile cache engages below

    from variational_mmt_tpu.utils.platform import honor_env_platform

    honor_env_platform()  # the axon plugin otherwise ignores JAX_PLATFORMS
    from variational_mmt_tpu.cli.train import add_args, build_config
    from variational_mmt_tpu.config import update_config
    from variational_mmt_tpu.data.dataset import BinarizedDataset, BucketIterator
    from variational_mmt_tpu.data.features import load_features
    from variational_mmt_tpu.data.vocab import Vocab
    from variational_mmt_tpu.models.model import build_model
    from variational_mmt_tpu.parallel.mesh import make_mesh
    from variational_mmt_tpu.train.trainer import Trainer

    p = argparse.ArgumentParser("vmmt-tpu sweep")
    add_args(p)
    p.add_argument("-sweep", required=True, help='e.g. "model.latent_dim=32,128 train.learning_rate=2e-4,4e-4"')
    p.add_argument("-sweep_steps", type=int, default=2000)
    p.add_argument("-sweep_bleu", type=int, default=0,
                   help="1: beam-decode the valid set after each config and "
                        "record valid_bleu (ranks on the gate's acceptance "
                        "metric, not just ppl)")
    p.add_argument("-sweep_beam", type=int, default=4)
    p.add_argument("-out", default="sweep_results.jsonl")
    opt = p.parse_args()

    sv = Vocab.load(opt.data + ".vocab.src.json")
    tv = Vocab.load(opt.data + ".vocab.tgt.json")
    train_ds = BinarizedDataset.load(opt.data + ".train.npz")
    valid_ds = BinarizedDataset.load(opt.data + ".valid.npz")
    train_feats = load_features(opt.train_img_feats) if opt.train_img_feats else None
    valid_feats = load_features(opt.valid_img_feats) if opt.valid_img_feats else None
    mesh = make_mesh(opt.num_shards)

    combos = parse_sweep(opt.sweep)
    print(f"sweeping {len(combos)} configs x {opt.sweep_steps} steps")
    results = []
    for i, overrides in enumerate(combos):
        cfg = build_config(opt, len(sv), len(tv))
        cfg.train.max_steps = opt.sweep_steps
        cfg.train.valid_every = opt.sweep_steps  # validate once at the end
        update_config(cfg, overrides)
        buckets = cfg.data.buckets
        ti = BucketIterator(train_ds, cfg.train.batch_size, buckets, img_feats=train_feats, seed=cfg.train.seed)
        vi = BucketIterator(valid_ds, cfg.train.batch_size, buckets, img_feats=valid_feats, shuffle=False)
        t0 = time.time()
        model = build_model(cfg.model)
        tr = Trainer(cfg, model, ti, vi, mesh=mesh)
        tr.train()
        val = tr.history[-1] if tr.history else tr.validate(tr.final_state)
        rec = {"overrides": overrides, "val_ppl": val["ppl"], "val_elbo": val.get("elbo"),
               "val_kl": val.get("kl"), "seconds": round(time.time() - t0, 1)}
        if opt.sweep_bleu:
            from variational_mmt_tpu.config import DecodeConfig
            from variational_mmt_tpu.decode.translator import Translator
            from variational_mmt_tpu.evals.bleu import corpus_bleu

            dcfg = DecodeConfig(beam_size=opt.sweep_beam, max_length=40,
                                batch_size=cfg.train.batch_size)
            translator = Translator(model, tr.final_state.params, sv, tv,
                                    dcfg, buckets=buckets)
            out = translator.translate_ids(
                [list(map(int, a)) for a in valid_ds.src],
                valid_feats if cfg.model.img_feat_dim else None)
            hyps = [tv.decode(nbest[0][1]) for nbest in out]
            refs = [[tv.decode(t)] for t in valid_ds.tgt]
            rec["valid_bleu"] = round(corpus_bleu(hyps, refs)["bleu"], 2)
        results.append(rec)
        print(f"[{i+1}/{len(combos)}] {overrides} -> ppl {val['ppl']:.3f} "
              f"(kl {val.get('kl', 0):.2f}"
              + (f", bleu {rec['valid_bleu']}" if "valid_bleu" in rec else "")
              + f", {rec['seconds']}s)")
        with open(opt.out, "a") as f:
            f.write(json.dumps(rec) + "\n")

    if opt.sweep_bleu:
        results.sort(key=lambda r: -r["valid_bleu"])
        print("\n=== ranked by validation BLEU ===")
        for r in results[:10]:
            print(f"bleu {r['valid_bleu']:6.2f}  ppl {r['val_ppl']:.3f}  {r['overrides']}")
    else:
        results.sort(key=lambda r: r["val_ppl"])
        print("\n=== ranked by validation ppl ===")
        for r in results[:10]:
            print(f"ppl {r['val_ppl']:.3f}  {r['overrides']}")


if __name__ == "__main__":
    main()
