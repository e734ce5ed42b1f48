#!/usr/bin/env python
"""IW-ELBO model-selection study (round-4 verdict #3).

The K-sample importance-weighted bound (SURVEY.md §2.4 config 5, §3.4) is
the reference paper's model-comparison instrument, yet three rounds of
EXPERIMENTS.md ranked models by BLEU alone. This study uses the bound as
built: on a GENUINELY STOCHASTIC corpus
(data/synthetic.py:make_stochastic_corpus) where the image shifts the
target *distribution* without determining it, held-out likelihood — not
BLEU — is the honest discriminator, and it has ANALYTIC floors:

  text-only floor   ln(S)           extra nats per sense-revealing sentence
  image-aware floor H(c_real|c_img) (the flip-noise entropy)

Expected physics: vmmt_c (conditional prior p(z|x,v) routes the image into
p(y|x,v)) approaches the image floor; nmt and vmmt_f (fixed prior — its
p(y|x) marginalizes z without ever seeing v) share the text-only floor.
vmmt_f can still beat nmt on *fit* if the latent mixture matches the
multi-modal target distribution better than autoregressive smearing.

Per (model, seed) this reports:
  - nmt: EXACT -log p(y|x) per sentence (force-decode; no bound needed)
  - vmmt_f / vmmt_c: the K-sample IW bound on -log p(y|x) for K in
    -k_list (default 1,5,25), which must tighten monotonically in K,
    plus the joint bound including p(v|z)
  - test BLEU for contrast (beam-4, latent-mean substitution)

Usage:
  python tools/iw_study.py -models nmt,vmmt_f,vmmt_c -seeds 11,12,13
Results append to iw_study.jsonl; a summary table prints at the end.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def build_cfg(model_type, seed, steps, platform, args):
    from variational_mmt_tpu.config import (Config, DataConfig, ModelConfig,
                                            TrainConfig)

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
            use_img_predict=model_type != "nmt",
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
            max_steps=steps,
            learning_rate=4e-4,
            kl_anneal="linear",
            kl_anneal_steps=max(1, steps // 2),
            kl_free_bits=args.kl_free_bits,
            report_every=max(50, steps // 5),
            valid_every=10 ** 9,
            checkpoint_every=10 ** 9,
        ),
        data=DataConfig(buckets=[16, 24, 32]),
    )


def iw_batches(src_ids, tgt_ids, feats, batch_size, buckets):
    """Device batches for iw_elbo_corpus / score_corpus (the translate-CLI
    -iw_eval layout: src/tgt_in/tgt_out/example_mask/img)."""
    import jax

    from variational_mmt_tpu.data.dataset import (BucketIterator, binarize,
                                                  buckets_with_catchall)

    ds = binarize(src_ids, tgt_ids)
    bks = buckets_with_catchall(
        buckets, max([1] + [len(s) for s in src_ids]
                     + [len(t) + 1 for t in tgt_ids]))
    it = BucketIterator(ds, batch_size, bks, img_feats=feats, shuffle=False)
    for b in it.epoch(0):
        tree = {"src": b.src, "tgt_in": b.tgt_in, "tgt_out": b.tgt_out,
                "example_mask": b.example_mask}
        if b.img is not None:
            tree["img"] = b.img
        yield jax.device_put(tree)


def run_one(model_type, seed, data, floors, args, platform):
    import jax

    from variational_mmt_tpu.config import DecodeConfig
    from variational_mmt_tpu.data.dataset import BucketIterator, binarize
    from variational_mmt_tpu.decode.iw_eval import iw_elbo_corpus
    from variational_mmt_tpu.decode.score import score_corpus
    from variational_mmt_tpu.decode.translator import Translator
    from variational_mmt_tpu.evals.bleu import corpus_bleu
    from variational_mmt_tpu.models.model import build_model
    from variational_mmt_tpu.train.trainer import Trainer

    (tr_src, tr_tgt, tr_feats, te_src, te_tgt, te_feats, sv, tv) = data
    cfg = build_cfg(model_type, seed, args.steps, platform, args)
    tr_ids = binarize([sv.encode(s) for s in tr_src],
                      [tv.encode(t) for t in tr_tgt])
    it = BucketIterator(tr_ids, cfg.train.batch_size, cfg.data.buckets,
                        seed=seed)
    model = build_model(cfg.model)
    t0 = time.time()
    trainer = Trainer(cfg, model, it,
                      train_feats=tr_feats if model_type != "nmt" else None)
    trainer.train()
    train_s = time.time() - t0
    params = trainer.final_state.params

    te_src_ids = [sv.encode(s) for s in te_src]
    te_tgt_ids = [tv.encode(t) for t in te_tgt]
    feats = te_feats if model_type != "nmt" else None

    rec = {"model": model_type, "seed": seed, "steps": args.steps,
           "kl_free_bits": args.kl_free_bits,
           "n_train": len(tr_src), "n_test": len(te_src),
           "train_s": round(train_s, 1),
           "floor_text_nats": round(floors[0], 3),
           "floor_img_nats": round(floors[1], 3)}

    # --- held-out likelihood ---
    if model_type == "nmt":
        logp, ntok, _ = score_corpus(model, params, te_src_ids, te_tgt_ids,
                                     None, buckets=cfg.data.buckets,
                                     batch_size=args.batch_size)
        rec["nll_exact_per_sent"] = round(float(-logp.mean()), 3)
    else:
        # posterior-collapse instruments (decode/diagnostics.py): active
        # units + per-dim KL over the held-out corpus — free-bits/annealing
        # ablations read these alongside the bound
        from variational_mmt_tpu.decode.diagnostics import latent_stats_corpus

        diag = latent_stats_corpus(
            model, params,
            iw_batches(te_src_ids, te_tgt_ids, feats, args.batch_size,
                       cfg.data.buckets))
        rec["au"] = diag["au"]
        rec["kl_per_sent"] = round(diag["kl_per_sent"], 3)
        rec["kl_active_dims"] = diag["kl_active_dims"]
        for k in args.k_list:
            out = iw_elbo_corpus(
                model, params,
                iw_batches(te_src_ids, te_tgt_ids, feats, args.batch_size,
                           cfg.data.buckets),
                k, jax.random.PRNGKey(seed * 1000 + k))
            rec[f"iw_text_nll_k{k}"] = round(-out["iw_text_per_sent"], 3)
            rec[f"iw_joint_k{k}"] = round(out["iw_elbo_per_sent"], 3)
        ks = sorted(args.k_list)
        rec["iw_monotone"] = all(
            rec[f"iw_text_nll_k{ks[i + 1]}"] <= rec[f"iw_text_nll_k{ks[i]}"]
            + 1e-3  # MC jitter tolerance at small gaps
            for i in range(len(ks) - 1))

    # --- BLEU for contrast ---
    dcfg = DecodeConfig(beam_size=4, max_length=40,
                        batch_size=args.batch_size)
    tr = Translator(model, params, sv, tv, dcfg, buckets=cfg.data.buckets)
    out = tr.translate_ids(te_src_ids, feats)
    hyps = [tv.decode(nb[0][1]) for nb in out]
    rec["test_bleu"] = round(corpus_bleu(hyps, [[r] for r in te_tgt])["bleu"], 2)
    return rec


def main():
    p = argparse.ArgumentParser("vmmt-tpu IW-ELBO study")
    p.add_argument("-models", default="nmt,vmmt_f,vmmt_c")
    p.add_argument("-seeds", default="11,12,13")
    p.add_argument("-k_list", default="1,5,25")
    p.add_argument("-n_train", type=int, default=6000)
    p.add_argument("-n_test", type=int, default=500)
    p.add_argument("-steps", type=int, default=2500)
    p.add_argument("-data_seed", type=int, default=0)
    p.add_argument("-vocab_size", type=int, default=200)
    p.add_argument("-n_senses", type=int, default=4)
    p.add_argument("-sense_flip", type=float, default=0.25)
    p.add_argument("-emb_dim", type=int, default=256)
    p.add_argument("-hidden_dim", type=int, default=256)
    p.add_argument("-latent_dim", type=int, default=64)
    p.add_argument("-img_dim", type=int, default=512)
    p.add_argument("-batch_size", type=int, default=64)
    p.add_argument("-kl_free_bits", type=float, default=0.0)
    p.add_argument("-out", default="iw_study.jsonl")
    args = p.parse_args()
    args.k_list = [int(k) for k in args.k_list.split(",")]

    from variational_mmt_tpu.utils.platform import honor_env_platform

    honor_env_platform()
    import jax

    platform = jax.devices()[0].platform
    if platform == "axon":
        platform = "tpu"
    print(f"platform: {platform}")

    from variational_mmt_tpu.data.synthetic import (make_stochastic_corpus,
                                                    stochastic_nll_floors)

    n = args.n_train + args.n_test
    src, tgt, feats, sv, tv, c_img, c_real, amb = make_stochastic_corpus(
        n, vocab_size=args.vocab_size, n_senses=args.n_senses,
        sense_flip=args.sense_flip, img_dim=args.img_dim,
        seed=args.data_seed)
    a = args.n_train
    floors = stochastic_nll_floors(src[a:], amb, args.n_senses,
                                   args.sense_flip, args.vocab_size)
    data = (src[:a], tgt[:a], feats[:a], src[a:], tgt[a:], feats[a:], sv, tv)
    print(f"test-split NLL floors (extra nats/sent): "
          f"text-only {floors[0]:.3f}, image-aware {floors[1]:.3f} "
          f"(gap {floors[0] - floors[1]:.3f})")

    results = []
    for model_type in args.models.split(","):
        for seed in [int(s) for s in args.seeds.split(",")]:
            r = run_one(model_type, seed, data, floors, args, platform)
            results.append(r)
            print(json.dumps(r))
            with open(args.out, "a") as f:
                f.write(json.dumps(r) + "\n")

    kmax = max(args.k_list)
    print("\n== summary: held-out -log p(y|x) per sent (mean +/- sd) ==")
    print(f"   analytic floors: text-only {floors[0]:.3f} / "
          f"image-aware {floors[1]:.3f}")
    for model_type in args.models.split(","):
        key = ("nll_exact_per_sent" if model_type == "nmt"
               else f"iw_text_nll_k{kmax}")
        xs = [r[key] for r in results if r["model"] == model_type]
        bl = [r["test_bleu"] for r in results if r["model"] == model_type]
        if xs:
            tag = "exact" if model_type == "nmt" else f"IW K={kmax}"
            print(f"{model_type:8s} {np.mean(xs):7.3f} +/- {np.std(xs):5.3f} "
                  f"({tag}, n={len(xs)})  BLEU {np.mean(bl):5.2f}")


if __name__ == "__main__":
    main()
