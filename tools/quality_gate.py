#!/usr/bin/env python
"""Discriminative quality gate (round-2, VERDICT #1).

The saturated deterministic task (BLEU ~100) can't detect a 1-BLEU bug.
This harness trains nmt / vmmt_f / vmmt_c on the *ambiguous* synthetic task
(data/synthetic.py:make_ambiguous_corpus) where

  - a per-sentence latent sense makes half the word types untranslatable
    from text alone (text-only asymptote ~28 BLEU),
  - the image feature encodes the sense (oracle ~67 BLEU),

over multiple seeds, and reports mean +/- sd test BLEU per model. It can
also inject deliberate defects to prove the gate detects them:

  kl_off      beta=1 from step 0 (no KL annealing). Measured round 2: NOT
              detectable here (+3.4, within seed noise) — with the p(v|z)
              image objective anchoring z, annealing isn't load-bearing on
              this task. Kept for documentation.
  attn_shift  DECODE-TIME-ONLY off-by-one: attention reads the source
              memory rolled by one position at decode (training is clean).
              The classic train/decode mismatch bug class.
  z_zero      DECODE-TIME-ONLY latent-substitution bug: decode uses z=0
              instead of the conditional prior mean.
  alpha0      beam length penalty disabled at decode

Usage:
  python tools/quality_gate.py -models nmt,vmmt_f,vmmt_c -seeds 11,12,13
  python tools/quality_gate.py -models vmmt_c -seeds 11 -defect kl_off

Results append to qg_results.jsonl (one JSON per run) and print a table.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def build_cfg(model_type, seed, steps, platform, args):
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
            dropout=0.3,
            word_dropout=0.1,
            latent_dim=args.latent_dim,
            img_feat_dim=args.img_dim if model_type != "nmt" else 0,
            img_feat_type="conv" if args.img_regions > 0 else "pool5",
            img_pool=args.img_pool,
            use_img_predict=(model_type != "nmt"
                             and not getattr(args, "no_img_predict", 0)),
            img_loss="logprob",
            z_cond="init+input",
            compute_dtype="bfloat16" if on_tpu else "float32",
            use_pallas=on_tpu,
            fused_ce=on_tpu,  # gate runs exercise the production fused path
        ),
        train=TrainConfig(
            seed=seed,
            batch_size=args.batch_size,
            steps_per_call=8 if on_tpu else 1,
            max_steps=steps,
            learning_rate=4e-4,
            kl_anneal="none" if args.defect == "kl_off" else "linear",
            kl_anneal_steps=max(1, steps // 2),
            kl_free_bits=args.kl_free_bits,
            ema_decay=getattr(args, "ema_decay", 0.0),
            ema_ramp=bool(getattr(args, "ema_ramp", 1)),
            pack=bool(getattr(args, "pack", 0)),
            pack_segments=getattr(args, "pack_segments", 4),
            report_every=max(50, steps // 5),
            valid_every=10 ** 9,
            checkpoint_every=10 ** 9,
        ),
        data=DataConfig(buckets=[16, 24, 32]),
    )


def apply_attn_shift_defect():
    """DECODE-TIME monkeypatch: the attention SCORES are computed against
    keys rolled one source position while the context values stay in place
    — i.e., the alignment found for source word i fetches word i±1's
    content. (Rolling keys AND values together is a no-op: content-based
    attention is permutation-equivariant — measured 53.1 vs clean 52.1.)
    Training-time variants of consistent shifts are *learnable*, so the
    gate injects the decode-time form, where this bug class actually
    bites."""
    import jax.numpy as jnp
    from variational_mmt_tpu.models import attention as attn_mod

    orig = attn_mod.GlobalAttention.__call__

    def buggy(self, query, memory, src_mask, keys=None):
        keys = self.project_memory(memory) if keys is None else keys
        return orig(self, query, memory, src_mask, jnp.roll(keys, 1, axis=1))

    attn_mod.GlobalAttention.__call__ = buggy
    return lambda: setattr(attn_mod.GlobalAttention, "__call__", orig)


def apply_z_zero_defect():
    """DECODE-TIME monkeypatch: latent-mean substitution returns 0 instead
    of the conditional prior mean (the bug that would silently turn vmmt_c
    decode into vmmt_f decode)."""
    import jax.numpy as jnp
    from variational_mmt_tpu.models import model as model_mod

    orig = model_mod.VMMTModel.prior_latent

    def buggy(self, src_summary, img):
        return jnp.zeros_like(orig(self, src_summary, img))

    model_mod.VMMTModel.prior_latent = buggy
    return lambda: setattr(model_mod.VMMTModel, "prior_latent", orig)


def run_one(model_type, seed, data, args, platform):
    import jax
    from variational_mmt_tpu.config import DecodeConfig
    from variational_mmt_tpu.data.dataset import BucketIterator, binarize
    from variational_mmt_tpu.decode.translator import Translator
    from variational_mmt_tpu.evals.bleu import corpus_bleu
    from variational_mmt_tpu.models.model import build_model
    from variational_mmt_tpu.train.trainer import Trainer

    (tr_src, tr_tgt, tr_feats, va_src, va_tgt, va_feats,
     te_src, te_tgt, te_feats, sv, tv) = data

    cfg = build_cfg(model_type, seed, args.steps, platform, args)
    tr_ids = binarize([sv.encode(s) for s in tr_src], [tv.encode(t) for t in tr_tgt])
    if cfg.train.pack:
        from variational_mmt_tpu.data.packing import PackedBucketIterator

        it = PackedBucketIterator(tr_ids, cfg.train.batch_size,
                                  cfg.data.buckets, seed=seed,
                                  max_segments=cfg.train.pack_segments)
    else:
        it = BucketIterator(tr_ids, cfg.train.batch_size, cfg.data.buckets, seed=seed)
    model = build_model(cfg.model)
    feats = tr_feats if model_type != "nmt" else None
    t0 = time.time()
    trainer = Trainer(cfg, model, it, train_feats=feats)
    trainer.train()
    train_s = time.time() - t0

    # decode-time-only defects activate AFTER clean training
    undo = None
    if args.defect == "attn_shift":
        undo = apply_attn_shift_defect()
    elif args.defect == "z_zero":
        undo = apply_z_zero_defect()

    dcfg = DecodeConfig(
        beam_size=4, max_length=40, batch_size=args.batch_size,
        alpha=0.0 if args.defect == "alpha0" else 0.6,
    )
    translator = Translator(model, trainer.final_state.params, sv, tv, dcfg,
                            buckets=cfg.data.buckets)
    t0 = time.time()
    out = translator.translate_ids(
        [sv.encode(s) for s in te_src],
        te_feats if model_type != "nmt" else None,
    )
    decode_s = time.time() - t0
    hyps = [tv.decode(nbest[0][1]) for nbest in out]
    bleu = corpus_bleu(hyps, [[r] for r in te_tgt])["bleu"]
    # validation-split BLEU as a secondary signal
    out_v = translator.translate_ids(
        [sv.encode(s) for s in va_src],
        va_feats if model_type != "nmt" else None,
    )
    vbleu = corpus_bleu([tv.decode(nb[0][1]) for nb in out_v], [[r] for r in va_tgt])["bleu"]
    res = {"model": model_type, "seed": seed, "defect": args.defect,
           "img_pool": args.img_pool, "img_regions": args.img_regions,
           "test_bleu": round(bleu, 2), "valid_bleu": round(vbleu, 2),
           "steps": args.steps, "train_s": round(train_s, 1),
           "decode_s": round(decode_s, 1)}
    if cfg.train.pack:
        res["pack"] = 1
    if getattr(args, "ema_decay", 0.0) > 0:
        # same harness, EMA weights: the raw-vs-Polyak decode comparison
        ema_tr = Translator(model, trainer.final_state.ema_params, sv, tv,
                            dcfg, buckets=cfg.data.buckets)
        out_e = ema_tr.translate_ids(
            [sv.encode(s) for s in te_src],
            te_feats if model_type != "nmt" else None,
        )
        hyps_e = [tv.decode(nb[0][1]) for nb in out_e]
        res["ema_decay"] = args.ema_decay
        res["ema_ramp"] = bool(getattr(args, "ema_ramp", 1))
        res["test_bleu_ema"] = round(
            corpus_bleu(hyps_e, [[r] for r in te_tgt])["bleu"], 2)
    if undo is not None:
        undo()
    return res


def main():
    p = argparse.ArgumentParser("vmmt-tpu quality gate")
    p.add_argument("-models", default="nmt,vmmt_f,vmmt_c")
    p.add_argument("-seeds", default="11,12,13")
    p.add_argument("-defect", default="none",
                   choices=["none", "kl_off", "attn_shift", "z_zero", "alpha0"])
    p.add_argument("-n_train", type=int, default=6000)
    p.add_argument("-n_valid", type=int, default=300)
    p.add_argument("-n_test", type=int, default=500)
    p.add_argument("-steps", type=int, default=2500)
    p.add_argument("-data_seed", type=int, default=0)
    p.add_argument("-vocab_size", type=int, default=200)
    p.add_argument("-emb_dim", type=int, default=256)
    p.add_argument("-hidden_dim", type=int, default=256)
    p.add_argument("-latent_dim", type=int, default=64)
    p.add_argument("-img_dim", type=int, default=512)
    p.add_argument("-img_regions", type=int, default=0,
                   help="R>0: conv-style (R, img_dim) region features with "
                        "the sense signal in ONE region (discriminates "
                        "img_pool attn vs mean)")
    p.add_argument("-img_pool", default="mean", choices=["mean", "attn"])
    p.add_argument("-batch_size", type=int, default=64)
    p.add_argument("-kl_free_bits", type=float, default=0.0)
    p.add_argument("-ema_ramp", type=int, default=1,
                   help="0: fixed decay (no num_updates warm-in)")
    p.add_argument("-ema_decay", type=float, default=0.0,
                   help=">0: also decode with the EMA (Polyak) weights and "
                        "report test_bleu_ema next to the raw test_bleu")
    p.add_argument("-corpus", default="ambiguous", choices=["ambiguous", "plain"],
                   help="plain: deterministic src->tgt task (synthetic.make_corpus"
                        ") — with -n_train small and -tgt_noise > 0 this is the "
                        "regularization regime where vmmt_f's latent + image-"
                        "grounding loss matter (the paper's VMMT_F headline), "
                        "not the disambiguation regime vmmt_c wins")
    p.add_argument("-tgt_noise", type=float, default=0.0,
                   help="plain corpus only: fraction of TRAIN-split gold target "
                        "tokens replaced by random tokens (valid/test stay "
                        "clean, so test BLEU measures generalization)")
    p.add_argument("-no_img_predict", type=int, default=0,
                   help="1: drop the p(v|z) image-prediction objective. For "
                        "vmmt_f this is the paper-faithful regularization "
                        "variant: without it the anneal drives KL(q||N(0,I)) "
                        "toward 0, so decode-time z=0 matches training and "
                        "the latent acts as pure noise regularization; WITH "
                        "it z is forced to encode v and decode-time z=0 is a "
                        "train/test mismatch (the standard gate shows this)")
    p.add_argument("-pack", type=int, default=0,
                   help="1: train with sequence packing (-pack on the train "
                        "CLI) — per-batch math is identical (tests/"
                        "test_pack.py), but batch COMPOSITION changes (more "
                        "sentences per step), so this measures the end-to-"
                        "end quality effect of the packed training regime")
    p.add_argument("-pack_segments", type=int, default=4)
    p.add_argument("-out", default="qg_results.jsonl")
    args = p.parse_args()

    from variational_mmt_tpu.utils.platform import honor_env_platform

    honor_env_platform()
    import jax

    platform = jax.devices()[0].platform
    if platform == "axon":
        platform = "tpu"
    print(f"platform: {platform}")

    from variational_mmt_tpu.data.synthetic import (
        corrupt_targets, make_ambiguous_corpus, make_corpus, oracle_bleu_bounds,
    )

    n = args.n_train + args.n_valid + args.n_test
    a, b = args.n_train, args.n_train + args.n_valid
    if args.corpus == "plain":
        src, tgt, feats, sv, tv = make_corpus(
            n, vocab_size=args.vocab_size, img_dim=args.img_dim,
            seed=args.data_seed,
        )
        if args.tgt_noise > 0:
            # corrupt TRAIN gold targets only; the deterministic mapping is
            # still the Bayes-optimal predictor, so clean-test BLEU measures
            # how well a model resists memorizing label noise
            corrupt_targets(tgt[:a], args.tgt_noise, args.vocab_size,
                            seed=args.data_seed + 1)
        o_bleu, t_bleu = 100.0, 100.0  # deterministic task, clean test refs
    else:
        src, tgt, feats, sv, tv, senses, amb = make_ambiguous_corpus(
            n, vocab_size=args.vocab_size, img_dim=args.img_dim,
            seed=args.data_seed, regions=args.img_regions,
        )
        o_bleu, t_bleu = oracle_bleu_bounds(src[b:], tgt[b:], senses[b:], amb,
                                            args.vocab_size)
    data = (src[:a], tgt[:a], feats[:a],
            src[a:b], tgt[a:b], feats[a:b],
            src[b:], tgt[b:], feats[b:], sv, tv)
    print(f"test-split asymptotes: oracle {o_bleu:.2f}, text-only {t_bleu:.2f}")

    results = []
    for model_type in args.models.split(","):
        for seed in [int(s) for s in args.seeds.split(",")]:
            r = run_one(model_type, seed, data, args, platform)
            r["oracle_bleu"] = round(o_bleu, 2)
            r["text_asymptote"] = round(t_bleu, 2)
            r["corpus"] = args.corpus
            r["n_train"] = args.n_train
            if args.corpus == "plain":
                r["tgt_noise"] = args.tgt_noise
            if args.no_img_predict:
                r["no_img_predict"] = 1
            results.append(r)
            print(json.dumps(r))
            with open(args.out, "a") as f:
                f.write(json.dumps(r) + "\n")

    print("\n== summary (test BLEU mean +/- sd) ==")
    for model_type in args.models.split(","):
        xs = [r["test_bleu"] for r in results if r["model"] == model_type]
        if xs:
            print(f"{model_type:8s} {np.mean(xs):6.2f} +/- {np.std(xs):4.2f}  (n={len(xs)})")


if __name__ == "__main__":
    main()
