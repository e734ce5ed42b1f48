"""``translate`` CLI — the reference's ``translate_mm_vi.py`` equivalent
(SURVEY.md §2.1 #15, §3.3): load a checkpoint (which carries config + vocabs
+ BPE-agnostic id space), beam-decode a source file with latent-mean
substitution, write n-best text; optionally score BLEU/METEOR against a
reference file and/or run the K-sample IW-ELBO evaluation (needs -tgt).
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from variational_mmt_tpu.config import DecodeConfig
from variational_mmt_tpu.data.bpe import BPE, remove_bpe
from variational_mmt_tpu.data.dataset import (BucketIterator, binarize,
                                               buckets_with_catchall)
from variational_mmt_tpu.data.features import load_features
from variational_mmt_tpu.data.tokenizer import tokenize
from variational_mmt_tpu.data.prefetch import prefetch
from variational_mmt_tpu.decode.iw_eval import iw_elbo_corpus
from variational_mmt_tpu.decode.translator import Translator
from variational_mmt_tpu.evals.bleu import corpus_bleu
from variational_mmt_tpu.evals.meteor import meteor_score
from variational_mmt_tpu.cli.loading import consumes_decode_feats, load_model_spec


def add_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("-model", required=True,
                   help="checkpoint dir (or specific step dir); "
                        "comma-separate several for an ensemble decode")
    p.add_argument("-use_ema", action="store_true",
                   help="decode with the EMA (Polyak-averaged) weights "
                        "instead of the raw params (requires a checkpoint "
                        "trained with -ema_decay > 0)")
    p.add_argument("-infer_dtype", default="float32",
                   choices=["float32", "bfloat16", "int8"],
                   help="decode-time weight precision: bfloat16 halves HBM "
                        "weight traffic on the bandwidth-bound decode step; "
                        "int8 (weight-only, per-channel) quarters the "
                        "persistent weight footprint for serving density")
    p.add_argument("-pallas_step", type=int, default=0,
                   help="1: fused Pallas decode-step kernel on TPU for "
                        "flagship-structure models (2-layer GRU, general "
                        "attention, input_feed); auto-skipped off-TPU "
                        "(interpret mode is slower than XLA there)")
    p.add_argument("-ensemble_mode", default="prob", choices=["prob", "logprob"],
                   help="how ensemble members' next-token distributions are "
                        "combined: mean probability (prob) or mean log-prob "
                        "(logprob, geometric)")
    p.add_argument("-src", required=True, help="source text file")
    p.add_argument("-tgt", default="", help="reference target (for BLEU / IW eval)")
    p.add_argument("-img_feats", default="", help="HDF5/NPY features aligned to src lines")
    p.add_argument("-output", default="pred.txt")
    p.add_argument("-tensor_parallel", type=int, default=1,
                   help=">1: decode on a 2-D (data, model) mesh with vocab-"
                        "parallel embeddings+generator (matches train "
                        "-tensor_parallel)")
    p.add_argument("-bpe_codes", default="", help="BPE codes from preprocess (applied to src)")
    p.add_argument("-pretokenized", action="store_true")
    p.add_argument("-no_lower", action="store_true")
    p.add_argument("-beam_size", type=int, default=4)
    p.add_argument("-n_best", type=int, default=1)
    p.add_argument("-max_length", type=int, default=100)
    p.add_argument("-min_length", type=int, default=0)
    p.add_argument("-alpha", type=float, default=0.6, help="GNMT length penalty exponent")
    p.add_argument("-block_ngram_repeat", type=int, default=0,
                   help="g > 0: no hypothesis may contain a repeated g-gram "
                        "(masked before top-k, on device)")
    p.add_argument("-ignore_when_blocking", default="",
                   help="space-separated tokens exempt from ngram blocking "
                        "(g-grams containing them may repeat)")
    p.add_argument("-coverage_beta", type=float, default=0.0,
                   help="GNMT coverage penalty weight (0 = off)")
    p.add_argument("-batch_size", type=int, default=32)
    p.add_argument("-replace_unk", action="store_true",
                   help="replace <unk> outputs with the max-attention source token")
    p.add_argument("-phrase_table", default="",
                   help="src<TAB>tgt map consulted by -replace_unk before "
                        "copying the source token verbatim")
    p.add_argument("-verbose", action="store_true",
                   help="per-sentence SENT/PRED/PRED SCORE (+ GOLD with -tgt) report")
    p.add_argument("-dump_beam", default="",
                   help="JSON path: raw beam search tree per sentence "
                        "(per-step parent/token/score for every beam slot)")
    p.add_argument("-dump_attn", default="",
                   help=".npz path: attention matrices of each 1-best hypothesis "
                        "(force-decoded; exact for the deterministic beam)")
    p.add_argument("-iw_eval", type=int, default=0, help="K>0: report K-sample IW-ELBO (needs -tgt)")
    p.add_argument("-latent_diag", action="store_true",
                   help="report posterior-collapse diagnostics over the corpus "
                        "(active units + per-dim KL; latent models, needs -tgt)")
    p.add_argument("-report_bleu", action="store_true")
    p.add_argument("-report_meteor", action="store_true")
    p.add_argument("-meteor_preset", default="original", choices=["original", "1.5-en"])
    p.add_argument("-meteor_synonyms", default="", help="synonym table file (meteor hook)")
    p.add_argument("-meteor_paraphrases", default="", help="paraphrase table file (meteor hook)")
    p.add_argument("-seed", type=int, default=1234)
    p.add_argument("-sampling_temp", type=float, default=0.0,
                   help="> 0: ancestral sampling instead of search "
                        "(requires -beam_size 1; 1.0 = untempered)")
    p.add_argument("-sampling_topk", type=int, default=0,
                   help="sample from the k highest-probability tokens only")
    p.add_argument("-sampling_topp", type=float, default=0.0,
                   help="nucleus sampling: smallest token set with "
                        "cumulative probability >= p")
    p.add_argument("-mbr_samples", type=int, default=0,
                   help="N > 0: minimum-Bayes-risk decode — draw N samples "
                        "per sentence (requires -sampling_temp > 0) and "
                        "output the consensus hypothesis (max expected "
                        "sentence-BLEU against the other samples)")
    p.add_argument("-latent_from", default="mean", choices=["mean", "sample"],
                   help="decode-time z: prior mean (reference behavior) or "
                        "a per-sentence sample z ~ p(z|x,v) seeded by -seed "
                        "(different seeds give alternative translations)")


def main(argv=None) -> None:
    from variational_mmt_tpu.utils.platform import honor_env_platform

    honor_env_platform()
    p = argparse.ArgumentParser("vmmt-tpu translate")
    add_args(p)
    opt = p.parse_args(argv)

    if "," in opt.model:
        # decidable from argv alone — fail BEFORE minutes of checkpoint IO
        incompatible = [
            ("-iw_eval", opt.iw_eval > 0),
            ("-latent_diag", opt.latent_diag),
            ("-verbose", opt.verbose),
            ("-dump_attn", bool(opt.dump_attn)),
            ("-tensor_parallel", opt.tensor_parallel > 1),
        ]
        bad = [f for f, on in incompatible if on]
        if bad:
            raise SystemExit(
                f"{', '.join(bad)}: not supported with an ensemble "
                "(force-decode scoring, the IW bound and TP sharding are "
                "defined per model) — pass a single -model")
    lm = load_model_spec(opt.model, use_ema=opt.use_ema)
    model, cfg, sv, tv = lm.model, lm.cfg, lm.src_vocab, lm.tgt_vocab
    params = lm.params[0]

    lower = not opt.no_lower
    with open(opt.src, encoding="utf-8") as f:
        raw = [line.rstrip("\n") for line in f]
    if opt.pretokenized:
        src_tok = [(l.lower() if lower else l).split() for l in raw]
    else:
        src_tok = [tokenize(l, lower=lower) for l in raw]
    bpe = None
    if opt.bpe_codes:
        bpe = BPE.load(opt.bpe_codes)
        src_tok = [bpe.segment(t) for t in src_tok]

    feats = load_features(opt.img_feats) if opt.img_feats else None
    if feats is not None:
        assert len(feats) == len(src_tok), "feature rows must align to src lines"
    needs_feats = [c for c in lm.cfgs if consumes_decode_feats(c.model)]
    if feats is None and needs_feats:
        # the conditional prior p(z|x,v) needs v at decode time; without this
        # guard the failure is a cryptic flax shape error inside the prior
        raise SystemExit(
            "this checkpoint's conditional prior was trained on image features "
            f"(img_feat_dim={needs_feats[0].model.img_feat_dim}): pass -img_feats "
            "aligned to the source file (vmmt_f decodes without features; "
            "vmmt_c cannot)"
        )

    if opt.mbr_samples > 0 and opt.sampling_temp <= 0.0:
        raise SystemExit(
            "-mbr_samples draws from the model: also pass -sampling_temp > 0 "
            "(e.g. 0.7; add -sampling_topk/-sampling_topp to truncate)")
    dcfg = DecodeConfig(
        beam_size=opt.beam_size, n_best=opt.n_best, max_length=opt.max_length,
        min_length=opt.min_length, alpha=opt.alpha, batch_size=opt.batch_size,
        replace_unk=opt.replace_unk, coverage_beta=opt.coverage_beta,
        dump_beam=bool(opt.dump_beam), ensemble_mode=opt.ensemble_mode,
        infer_dtype=opt.infer_dtype,
        pallas_step=bool(opt.pallas_step) and jax.default_backend() == "tpu",
        sampling_temp=opt.sampling_temp, sampling_topk=opt.sampling_topk,
        sampling_topp=opt.sampling_topp, latent_from=opt.latent_from,
        decode_seed=opt.seed,
        block_ngram_repeat=opt.block_ngram_repeat,
        ignore_when_blocking=opt.ignore_when_blocking,
    )
    mesh = None
    if opt.tensor_parallel > 1:
        from variational_mmt_tpu.parallel.tp import (
            make_mesh_2d, validate_tp_divisibility,
        )

        validate_tp_divisibility(cfg.model, opt.tensor_parallel)
        n_data = max(1, len(jax.devices()) // opt.tensor_parallel)
        mesh = make_mesh_2d(n_data, opt.tensor_parallel)
        print(f"decode over ({n_data} data x {opt.tensor_parallel} model) mesh")
    elif len(jax.devices()) > 1 and opt.batch_size % len(jax.devices()) == 0:
        from variational_mmt_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        print(f"data-parallel decode over {mesh.size} devices")
    if lm.ensemble:
        print(f"ensemble of {len(lm.models)} checkpoints ({opt.ensemble_mode})")
    tr_model, tr_params = lm.translator_args()
    translator = Translator(tr_model, tr_params, sv, tv, dcfg,
                            buckets=cfg.data.buckets or [16, 24, 32, 48, 64],
                            mesh=mesh)
    if opt.phrase_table:
        if not opt.replace_unk:
            raise SystemExit("-phrase_table is only consulted by -replace_unk; "
                             "pass both (the table maps the copied source token)")
        skipped = 0
        with open(opt.phrase_table, encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                # TAB separates source from target; the target may contain
                # spaces ("cat<TAB>le chat"). Without a TAB, first space.
                src_w, sep, tgt_w = line.partition("\t")
                if not sep:
                    src_w, sep, tgt_w = line.partition(" ")
                src_w, tgt_w = src_w.strip(), tgt_w.strip()
                if not src_w or not tgt_w:
                    continue
                if " " in src_w:
                    skipped += 1  # multi-word sources can't match one token
                    continue
                translator.phrase_table[src_w] = tgt_w
        print(f"loaded {len(translator.phrase_table)} phrase-table entries"
              + (f" ({skipped} multi-word sources skipped)" if skipped else ""))
    import time

    want_scores = opt.verbose or opt.dump_attn
    # encoded once, ALWAYS before t0: reused below for force-decode scoring /
    # IW eval, and keeping the encode outside the timed region for every
    # flag combination makes the printed sent/s comparable across runs
    src_ids = [sv.encode(t) for t in src_tok]
    t0 = time.time()
    if opt.mbr_samples > 0:
        from variational_mmt_tpu.decode.mbr import mbr_translate_ids

        id_results = mbr_translate_ids(
            translator, src_ids, feats, n_samples=opt.mbr_samples)
        results = [
            translator.nbest_to_text(nbest, src_tok[i], keep_ids=want_scores)
            for i, nbest in enumerate(id_results)
        ]
    else:
        results = translator.translate_tokens(
            src_tok, feats, keep_ids=want_scores, src_ids=src_ids)
    dt = time.time() - t0
    mode = (f"mbr {opt.mbr_samples} samples" if opt.mbr_samples > 0 else
            "sampling" if opt.sampling_temp > 0 else f"beam {opt.beam_size}")
    print(f"translated {len(results)} sentences in {dt:.1f}s "
          f"({len(results) / max(dt, 1e-9):.1f} sent/s, {mode})")

    with open(opt.output, "w", encoding="utf-8") as f:
        for nbest in results:
            for entry in nbest[: opt.n_best]:
                f.write(entry[1] + "\n")
    print(f"wrote {opt.output}")

    if opt.dump_beam:
        import json

        with open(opt.dump_beam, "w", encoding="utf-8") as f:
            json.dump({str(i): translator.beam_traces[i]
                       for i in sorted(translator.beam_traces)}, f)
        print(f"wrote beam search trees for {len(translator.beam_traces)} "
              f"sentences -> {opt.dump_beam}")

    bucket_list = cfg.data.buckets or [16, 24, 32, 48, 64]
    pred_lp = pred_nt = None
    if want_scores:
        # force-decode each 1-best hypothesis (raw BPE-level ids): TRUE
        # log p(y|x, z=prior-mean) — the penalized beam scores are NOT
        # log-probs (alpha/coverage-normalized; greedy path returns zeros) —
        # plus the full attention matrices for -dump_attn (identical to what
        # the deterministic beam computed; the on-device search itself only
        # tracks argmax positions)
        from variational_mmt_tpu.decode.score import score_corpus

        if opt.latent_from == "sample":
            # the scorer substitutes z = prior mean; the sampled-z decode
            # that produced these hypotheses used a different z
            print("note: force-decode scores/attention use z = prior mean, "
                  "not the sampled z the decode drew (-latent_from sample)")
        pred_ids = [list(nbest[0][2]) for nbest in results]
        pred_lp, pred_nt, attns = score_corpus(
            model, params, src_ids, pred_ids, feats,
            buckets=bucket_list, batch_size=opt.batch_size,
            return_attn=bool(opt.dump_attn),
        )
        if opt.dump_attn:
            np.savez(opt.dump_attn, **{f"attn_{i}": a for i, a in enumerate(attns)})
            print(f"wrote attention matrices for {len(attns)} sentences -> {opt.dump_attn}")

    if opt.verbose:
        for i, nbest in enumerate(results):
            print(f"\nSENT {i + 1}: {' '.join(src_tok[i])}")
            for k, entry in enumerate(nbest[: opt.n_best]):
                print(f"PRED {i + 1}.{k + 1}: {entry[1]}")
                if k == 0:
                    # true force-decoded log p(y|x); the beam's own score is
                    # length/coverage-penalized and not a log-prob
                    print(f"PRED SCORE: {pred_lp[i]:.4f}")
                else:
                    print(f"BEAM SCORE: {entry[0]:.4f}")

    if opt.iw_eval > 0 and not opt.tgt:
        print("note: -iw_eval skipped — the IW-ELBO needs gold targets (-tgt)")
    if opt.latent_diag and not opt.tgt:
        print("note: -latent_diag skipped — the posterior q(z|x,y,v) needs "
              "gold targets (-tgt)")

    if opt.tgt:
        with open(opt.tgt, encoding="utf-8") as f:
            if opt.pretokenized:
                refs = [(l.lower() if lower else l).rstrip("\n").split() for l in f]
            else:
                refs = [tokenize(l, lower=lower) for l in f]
        hyps = [nbest[0][1].split() for nbest in results]
        gold_ids = [tv.encode(bpe.segment(t) if bpe else t) for t in refs]
        # BLEU always prints with -tgt (it is the gate metric); -report_bleu
        # is accepted for reference-CLI compatibility but adds nothing
        bleu = corpus_bleu(hyps, [[r] for r in refs])
        print(f"BLEU = {bleu['bleu']:.2f} (BP={bleu['bp']:.3f}, ratio={bleu['ratio']:.3f})")

        if opt.verbose:
            # GOLD score: force-decode the reference under the decode-time
            # model (z = prior mean), the upstream Translator's gold-scoring
            # behavior. Gated on -verbose: it costs a teacher-forced pass
            # over the corpus + per-bucket compiles, which a BLEU-only sweep
            # should not pay.
            from variational_mmt_tpu.decode.score import report_score, score_corpus

            gold_lp, gold_nt, _ = score_corpus(
                model, params, src_ids, gold_ids, feats,
                buckets=bucket_list, batch_size=opt.batch_size,
            )
            print(report_score("PRED", pred_lp, pred_nt))
            print(report_score("GOLD", gold_lp, gold_nt))
            for i, r in enumerate(refs):
                print(f"GOLD {i + 1}: {' '.join(r)}  (score {gold_lp[i]:.4f})")
        if opt.report_meteor:
            from variational_mmt_tpu.evals.meteor import load_table

            met = meteor_score(
                hyps, [[r] for r in refs], preset=opt.meteor_preset,
                synonyms=load_table(opt.meteor_synonyms) if opt.meteor_synonyms else None,
                paraphrases=load_table(opt.meteor_paraphrases) if opt.meteor_paraphrases else None,
            )
            print(f"METEOR({opt.meteor_preset}) = {met['meteor']:.2f}")

        for flag, on in (("-iw_eval", opt.iw_eval > 0),
                         ("-latent_diag", opt.latent_diag)):
            if on and not model.is_latent:
                print(f"note: {flag} skipped — defined for latent models "
                      f"only (checkpoint is {cfg.model.model_type})")
        if (opt.iw_eval > 0 or opt.latent_diag) and model.is_latent:
            ds = binarize(src_ids, gold_ids)
            # catch-all bucket: over-long pairs must be scored in full, not
            # silently truncated at batch assembly (same guard as decode and
            # force-decode scoring)
            iw_buckets = buckets_with_catchall(
                bucket_list,
                max([1] + [len(s) for s in src_ids]
                    + [len(t) + 1 for t in gold_ids]))
            it = BucketIterator(ds, opt.batch_size, iw_buckets,
                                img_feats=feats, shuffle=False)

            def to_dev(b):
                tree = {"src": b.src, "tgt_in": b.tgt_in, "tgt_out": b.tgt_out,
                        "example_mask": b.example_mask}
                if b.img is not None:
                    tree["img"] = b.img
                return jax.device_put(tree)

            if opt.iw_eval > 0:
                out = iw_elbo_corpus(model, params, prefetch(it.epoch(0), transform=to_dev),
                                     opt.iw_eval, jax.random.PRNGKey(opt.seed), mesh=mesh)
                print(f"IW-ELBO (K={opt.iw_eval}): joint {out['iw_elbo_per_sent']:.2f} / "
                      f"text {out['iw_text_per_sent']:.2f} per sent; "
                      f"IW-ppl {out['iw_ppl']:.2f}")
            if opt.latent_diag:
                from variational_mmt_tpu.decode.diagnostics import latent_stats_corpus

                d = latent_stats_corpus(
                    model, params, prefetch(it.epoch(0), transform=to_dev))
                print(f"LATENT DIAG: active units {d['au']}/{d['latent_dim']} "
                      f"(delta {d['au_delta']}); KL/sent {d['kl_per_sent']:.3f} "
                      f"over {d['kl_active_dims']} active dims; "
                      f"top KL_d {d['kl_top8']}")


if __name__ == "__main__":
    main()
