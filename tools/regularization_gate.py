#!/usr/bin/env python
"""Regularization gate (round-2 verdict #6): a regime where VMMT_F can earn
its keep.

The discriminative gate (tools/quality_gate.py) validates vmmt_c — its
conditional prior routes decode-time image information. vmmt_f CANNOT win
there: its prior is fixed N(0,I), so decode ignores the image by design and
the task's ambiguity is unresolvable. The paper's VMMT_F gains are
REGULARIZATION-driven (ACL 2019 §5: multi-task ELBO + image prediction on
limited data), so this harness builds the matching regime:

- the DETERMINISTIC task (data/synthetic.py:make_corpus — text alone fully
  determines the translation, image = noisy bag-of-words of the source);
- LOW DATA (-n_train, default 800) so a 2x256 model overfits;
- optional TRAIN-TARGET NOISE (-train_noise p: each training target token
  is resampled uniformly with prob p; validation/test references stay
  clean) — the memorization trap regularization should resist.

nmt vs vmmt_f over >=N seeds; per-seed PAIRED deltas (same data, same seed)
plus mean +/- sd. Results append to reg_results.jsonl.

Usage:
  python tools/regularization_gate.py -n_train 800 -train_noise 0.3 -seeds 11,12,13
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def build_cfg(model_type, seed, args, platform):
    from variational_mmt_tpu.config import Config, DataConfig, ModelConfig, TrainConfig

    on_tpu = platform == "tpu"
    return Config(
        model=ModelConfig(
            model_type=model_type,
            src_vocab_size=args.vocab_size,
            tgt_vocab_size=args.vocab_size,
            emb_dim=args.emb_dim,
            hidden_dim=args.hidden_dim,
            enc_layers=2,
            dec_layers=2,
            dropout=args.dropout,
            word_dropout=0.1 if model_type != "nmt" else 0.0,
            latent_dim=args.latent_dim,
            img_feat_dim=args.img_dim if model_type != "nmt" else 0,
            use_img_predict=(model_type != "nmt"
                             and not getattr(args, "no_img_predict", 0)),
            img_loss="logprob",
            z_cond="init+input",
            compute_dtype="bfloat16" if on_tpu else "float32",
            use_pallas=on_tpu,
            fused_ce=on_tpu,
        ),
        train=TrainConfig(
            seed=seed,
            batch_size=args.batch_size,
            steps_per_call=8 if on_tpu else 1,
            max_steps=args.steps,
            learning_rate=4e-4,
            kl_anneal="linear",
            kl_anneal_steps=max(1, args.steps // 2),
            report_every=max(50, args.steps // 5),
            valid_every=10 ** 9,
            checkpoint_every=10 ** 9,
        ),
        data=DataConfig(buckets=[16, 24]),
    )


def run_one(model_type, seed, data, args, platform):
    from variational_mmt_tpu.config import DecodeConfig
    from variational_mmt_tpu.data.dataset import BucketIterator, binarize
    from variational_mmt_tpu.decode.translator import Translator
    from variational_mmt_tpu.evals.bleu import corpus_bleu
    from variational_mmt_tpu.models.model import build_model
    from variational_mmt_tpu.train.trainer import Trainer

    tr_src, tr_tgt, tr_feats, te_src, te_tgt, te_feats, sv, tv = data

    cfg = build_cfg(model_type, seed, args, platform)
    tr_ids = binarize([sv.encode(s) for s in tr_src], [tv.encode(t) for t in tr_tgt])
    it = BucketIterator(tr_ids, cfg.train.batch_size, cfg.data.buckets, seed=seed)
    model = build_model(cfg.model)
    feats = tr_feats if model_type != "nmt" else None
    t0 = time.time()
    trainer = Trainer(cfg, model, it, train_feats=feats)
    trainer.train()
    train_s = time.time() - t0

    dcfg = DecodeConfig(beam_size=4, max_length=32, batch_size=args.batch_size)
    translator = Translator(model, trainer.final_state.params, sv, tv, dcfg,
                            buckets=cfg.data.buckets)
    # vmmt_f decodes WITHOUT the image (fixed prior -> z = 0): the paper's
    # deployment story — image needed at training time only
    out = translator.translate_ids([sv.encode(s) for s in te_src], None)
    hyps = [tv.decode(nbest[0][1]) for nbest in out]
    bleu = corpus_bleu(hyps, [[r] for r in te_tgt])["bleu"]
    return {"model": model_type, "seed": seed, "test_bleu": round(bleu, 2),
            "n_train": args.n_train, "train_noise": args.train_noise,
            "no_img_predict": getattr(args, "no_img_predict", 0),
            "steps": args.steps, "train_s": round(train_s, 1)}


def main():
    p = argparse.ArgumentParser("vmmt-tpu regularization gate")
    p.add_argument("-models", default="nmt,vmmt_f")
    p.add_argument("-seeds", default="11,12,13")
    p.add_argument("-n_train", type=int, default=800)
    p.add_argument("-n_test", type=int, default=500)
    p.add_argument("-train_noise", type=float, default=0.3,
                   help="per-token uniform resampling prob on TRAIN targets")
    p.add_argument("-steps", type=int, default=1500)
    p.add_argument("-data_seed", type=int, default=0)
    p.add_argument("-vocab_size", type=int, default=200)
    p.add_argument("-emb_dim", type=int, default=256)
    p.add_argument("-hidden_dim", type=int, default=256)
    p.add_argument("-latent_dim", type=int, default=64)
    p.add_argument("-img_dim", type=int, default=512)
    p.add_argument("-dropout", type=float, default=0.3)
    p.add_argument("-no_img_predict", type=int, default=0,
                   help="1: drop p(v|z) for vmmt_f — the anneal then drives "
                        "KL(q||N(0,I)) to ~0 so decode-time z=0 matches "
                        "training (pure noise regularization, the paper-"
                        "faithful deployment); with p(v|z) on, z must encode "
                        "v and z=0 decode is a train/test mismatch")
    p.add_argument("-batch_size", type=int, default=64)
    p.add_argument("-out", default="reg_results.jsonl")
    args = p.parse_args()

    from variational_mmt_tpu.utils.platform import honor_env_platform

    honor_env_platform()
    import jax

    platform = jax.devices()[0].platform
    if platform == "axon":
        platform = "tpu"
    print(f"platform: {platform}")

    from variational_mmt_tpu.data.synthetic import make_corpus

    n = args.n_train + args.n_test
    src, tgt, feats, sv, tv = make_corpus(
        n, vocab_size=args.vocab_size, img_dim=args.img_dim,
        max_len=16, seed=args.data_seed,
    )
    tr_src, te_src = src[:args.n_train], src[args.n_train:]
    tr_tgt, te_tgt = tgt[:args.n_train], tgt[args.n_train:]
    tr_feats, te_feats = feats[:args.n_train], feats[args.n_train:]

    if args.train_noise > 0:
        # corrupt TRAINING targets only (memorization trap); test refs clean
        from variational_mmt_tpu.data.synthetic import corrupt_targets

        tr_tgt = [list(t) for t in tr_tgt]
        corrupt_targets(tr_tgt, args.train_noise, args.vocab_size,
                        seed=args.data_seed + 1)

    data = (tr_src, tr_tgt, tr_feats, te_src, te_tgt, te_feats, sv, tv)
    results = []
    for model_type in args.models.split(","):
        for seed in [int(s) for s in args.seeds.split(",")]:
            r = run_one(model_type, seed, data, args, platform)
            results.append(r)
            print(json.dumps(r))
            with open(args.out, "a") as f:
                f.write(json.dumps(r) + "\n")

    print("\n== summary (test BLEU vs clean refs) ==")
    by_model = {}
    for m in args.models.split(","):
        xs = [r["test_bleu"] for r in results if r["model"] == m]
        by_model[m] = xs
        if xs:
            print(f"{m:8s} {np.mean(xs):6.2f} +/- {np.std(xs):4.2f}  (n={len(xs)})")
    if "nmt" in by_model and "vmmt_f" in by_model and by_model["nmt"]:
        deltas = [b - a for a, b in zip(by_model["nmt"], by_model["vmmt_f"])]
        print(f"paired delta (vmmt_f - nmt): "
              f"{np.mean(deltas):+.2f} +/- {np.std(deltas):.2f}  per-seed {deltas}")


if __name__ == "__main__":
    main()
