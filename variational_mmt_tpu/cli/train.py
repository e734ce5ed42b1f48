"""``train`` CLI — the reference's ``train_mm_vi_model1.py`` equivalent
(SURVEY.md §2.1 #3, §3.2): load binarized data + image features, build the
configured model (nmt / vmmt_f / vmmt_c), run the KL-annealed ELBO training
loop with validation, plateau LR decay, and checkpointing; resume with
``-train_from``.
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from variational_mmt_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from variational_mmt_tpu.data.dataset import BinarizedDataset, BucketIterator
from variational_mmt_tpu.data.features import load_features
from variational_mmt_tpu.data.vocab import Vocab
from variational_mmt_tpu.models.model import build_model
from variational_mmt_tpu.parallel.mesh import make_mesh
from variational_mmt_tpu.train.checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from variational_mmt_tpu.train.trainer import Trainer


def add_args(p: argparse.ArgumentParser) -> None:
    # data
    p.add_argument("-data", required=True, help="preprocess save_data prefix")
    p.add_argument("-save_model", required=True, help="checkpoint directory")
    p.add_argument("-train_img_feats", default="", help="HDF5/NPY train features")
    p.add_argument("-valid_img_feats", default="")
    p.add_argument("-train_from", default="", help="checkpoint dir/path to resume")
    # model
    p.add_argument("-model_type", default="vmmt_f", choices=["nmt", "vmmt_f", "vmmt_c"])
    p.add_argument("-rnn_type", default="gru", choices=["gru", "lstm"],
                   help="recurrent cell (the paper's models are GRU; LSTM is "
                        "the upstream baseline option)")
    p.add_argument("-word_vec_size", type=int, default=500)
    p.add_argument("-rnn_size", type=int, default=500)
    p.add_argument("-enc_layers", type=int, default=2)
    p.add_argument("-dec_layers", type=int, default=2)
    p.add_argument("-dropout", type=float, default=0.3)
    p.add_argument("-word_dropout", type=float, default=0.0)
    p.add_argument("-input_feed", type=int, default=1)
    p.add_argument("-global_attention", default="general", choices=["general", "dot", "mlp"])
    p.add_argument("-z_latent_dim", type=int, default=128)
    p.add_argument("-img_feat_dim", type=int, default=2048)
    p.add_argument("-img_feat_type", default="pool5", choices=["pool5", "conv"])
    p.add_argument("-img_pool", default="mean", choices=["mean", "attn"],
                   help="conv-region pooling: mean | text-conditioned attention")
    p.add_argument("-use_img_predict", type=int, default=1)
    p.add_argument("-img_loss", default="logprob", choices=["logprob", "mse", "cosine"])
    p.add_argument("-img_loss_weight", type=float, default=1.0)
    p.add_argument("-z_cond", default="init", choices=["init", "init+input"])
    p.add_argument("-share_embeddings", type=int, default=0,
                   help="one embedding table for source and target "
                        "(requires preprocess -share_vocab)")
    p.add_argument("-share_decoder_embeddings", type=int, default=0,
                   help="tie generator weights to the target embedding table "
                        "(requires -word_vec_size == -rnn_size)")
    p.add_argument("-pre_word_vecs_enc", default="",
                   help="vocab-aligned .npy embedding table for the encoder "
                        "(tools/embeddings_to_npy.py)")
    p.add_argument("-pre_word_vecs_dec", default="",
                   help="vocab-aligned .npy embedding table for the decoder")
    p.add_argument("-fix_word_vecs_enc", type=int, default=0,
                   help="freeze the encoder embedding table")
    p.add_argument("-fix_word_vecs_dec", type=int, default=0,
                   help="freeze the decoder embedding table")
    p.add_argument("-compute_dtype", default="bfloat16", choices=["float32", "bfloat16"])
    p.add_argument("-use_pallas", type=int, default=0,
                   help="fused Pallas GRU kernels for the encoder scans")
    p.add_argument("-fused_ce", type=int, default=0,
                   help="fuse generator GEMM + CE (never materializes (B*T,V) logits)")
    p.add_argument("-config", default="",
                   help="JSON Config file; explicit CLI flags override it")
    # optimization
    p.add_argument("-batch_size", type=int, default=64)
    p.add_argument("-grad_accum", type=int, default=1,
                   help="micro-batches per optimizer step (activation-memory scaling)")
    p.add_argument("-steps_per_call", type=int, default=1,
                   help="optimizer steps per jit dispatch (amortizes dispatch/RPC latency)")
    p.add_argument("-skip_nonfinite", type=int, default=0,
                   help="skip optimizer updates with NaN/Inf gradients (bf16 hygiene)")
    p.add_argument("-max_steps", type=int, default=20000)
    p.add_argument("-epochs", type=int, default=0)
    p.add_argument("-optim", default="adam",
                   choices=["adam", "sgd", "adadelta", "adagrad"])
    p.add_argument("-learning_rate", type=float, default=4e-4)
    p.add_argument("-adam_beta1", type=float, default=0.9)
    p.add_argument("-adam_beta2", type=float, default=0.999)
    p.add_argument("-param_init", type=float, default=0.0,
                   help=">0: uniform(-r,r) re-init of all params (reference "
                        "default 0.1; 0 keeps per-layer framework init)")
    p.add_argument("-max_grad_norm", type=float, default=5.0)
    p.add_argument("-learning_rate_decay", type=float, default=0.5)
    p.add_argument("-start_decay_at", type=int, default=0)
    p.add_argument("-label_smoothing", type=float, default=0.0)
    p.add_argument("-kl_anneal", default="linear", choices=["linear", "sigmoid", "none"])
    p.add_argument("-kl_anneal_steps", type=int, default=10000)
    p.add_argument("-kl_anneal_start", type=int, default=0)
    p.add_argument("-kl_free_bits", type=float, default=0.0)
    p.add_argument("-ema_decay", type=float, default=0.0,
                   help=">0: maintain an EMA (Polyak average) of the params "
                        "in the jitted step; decode it with translate/serve "
                        "-use_ema or publish via release_checkpoint -ema")
    p.add_argument("-ema_ramp", type=int, default=1,
                   help="1: warm the EMA decay in as min(d,(1+n)/(10+n)) "
                        "over update count n (recommended; fixed decay "
                        "anchors short runs to the init point)")
    p.add_argument("-seed", type=int, default=1234)
    # loop
    p.add_argument("-report_every", type=int, default=50)
    p.add_argument("-valid_every", type=int, default=500)
    p.add_argument("-checkpoint_every", type=int, default=1000)
    p.add_argument("-keep_checkpoints", type=int, default=3)
    p.add_argument("-buckets", default="16,24,32,48,64")
    p.add_argument("-pack", type=int, default=0,
                   help="1: sequence packing — multiple sentences per row "
                        "(segment-reset recurrences, segment-masked "
                        "attention, per-segment latents). Identical "
                        "per-sentence math, ~25-35%% more real tokens per "
                        "step at Multi30k lengths. GRU models only; the row "
                        "length is the largest -buckets value")
    p.add_argument("-pack_segments", type=int, default=4,
                   help="max sentences packed into one row (static shape)")
    p.add_argument("-num_shards", type=int, default=0, help="devices for data parallelism (0=all)")
    p.add_argument("-tensor_parallel", type=int, default=1,
                   help=">1: 2-D (data, model) device mesh; vocab-parallel "
                        "embeddings + generator sharded over the model axis "
                        "(vocab sizes must be divisible; see preprocess "
                        "-vocab_pad_multiple)")
    p.add_argument("-metrics_log", default="", help="JSONL scalar log path (ELBO decomposition)")
    p.add_argument("-tensorboard_dir", default="",
                   help="TensorBoard scalar event dir (native writer, no TF dependency)")
    p.add_argument("-profile_dir", default="", help="jax.profiler trace directory")
    p.add_argument("-valid_bleu", type=int, default=0,
                   help="1: also report greedy BLEU on the validation set at each validation")
    p.add_argument("-valid_iw", type=int, default=0,
                   help="K>0: also report the K-sample IW-ELBO bound at each validation")


# Complete flag -> Config field map (every add_args flag that lands in
# Config). -config override resolution and tests iterate this, so adding a
# flag without extending it is an error the CLI raises at parse time.
FLAG2KEY = {
    "data": ("data", "save_data"),
    "buckets": ("data", "buckets"),
    "model_type": ("model", "model_type"),
    "rnn_type": ("model", "rnn_type"),
    "word_vec_size": ("model", "emb_dim"),
    "rnn_size": ("model", "hidden_dim"),
    "enc_layers": ("model", "enc_layers"),
    "dec_layers": ("model", "dec_layers"),
    "dropout": ("model", "dropout"),
    "word_dropout": ("model", "word_dropout"),
    "input_feed": ("model", "input_feed"),
    "global_attention": ("model", "attn_type"),
    "z_latent_dim": ("model", "latent_dim"),
    "img_feat_dim": ("model", "img_feat_dim"),
    "img_feat_type": ("model", "img_feat_type"),
    "img_pool": ("model", "img_pool"),
    "use_img_predict": ("model", "use_img_predict"),
    "img_loss": ("model", "img_loss"),
    "img_loss_weight": ("model", "img_loss_weight"),
    "z_cond": ("model", "z_cond"),
    "share_decoder_embeddings": ("model", "share_decoder_embeddings"),
    "share_embeddings": ("model", "share_embeddings"),
    "compute_dtype": ("model", "compute_dtype"),
    "use_pallas": ("model", "use_pallas"),
    "fused_ce": ("model", "fused_ce"),
    "batch_size": ("train", "batch_size"),
    "grad_accum": ("train", "grad_accum"),
    "steps_per_call": ("train", "steps_per_call"),
    "skip_nonfinite": ("train", "skip_nonfinite"),
    "fix_word_vecs_enc": ("train", "fix_word_vecs_enc"),
    "fix_word_vecs_dec": ("train", "fix_word_vecs_dec"),
    "max_steps": ("train", "max_steps"),
    "epochs": ("train", "epochs"),
    "optim": ("train", "optimizer"),
    "learning_rate": ("train", "learning_rate"),
    "adam_beta1": ("train", "adam_beta1"),
    "adam_beta2": ("train", "adam_beta2"),
    "param_init": ("train", "param_init"),
    "max_grad_norm": ("train", "max_grad_norm"),
    "learning_rate_decay": ("train", "lr_decay"),
    "start_decay_at": ("train", "start_decay_at"),
    "label_smoothing": ("train", "label_smoothing"),
    "kl_anneal": ("train", "kl_anneal"),
    "kl_anneal_steps": ("train", "kl_anneal_steps"),
    "kl_anneal_start": ("train", "kl_anneal_start"),
    "kl_free_bits": ("train", "kl_free_bits"),
    "ema_decay": ("train", "ema_decay"),
    "ema_ramp": ("train", "ema_ramp"),
    "seed": ("train", "seed"),
    "report_every": ("train", "report_every"),
    "valid_every": ("train", "valid_every"),
    "checkpoint_every": ("train", "checkpoint_every"),
    "keep_checkpoints": ("train", "keep_checkpoints"),
    "pack": ("train", "pack"),
    "pack_segments": ("train", "pack_segments"),
    "num_shards": ("train", "num_data_shards"),
    "tensor_parallel": ("train", "num_model_shards"),
}

# flags that configure the run but have no Config field
RUNTIME_FLAGS = {
    "save_model", "train_img_feats", "valid_img_feats", "train_from",
    "pre_word_vecs_enc", "pre_word_vecs_dec",
    "config", "metrics_log", "tensorboard_dir", "profile_dir", "valid_bleu",
    "valid_iw",
}


def passed_flags(argv) -> set:
    """Names of flags explicitly present on the command line, resolved
    through the same unambiguous-prefix matching argparse applies. Raises
    SystemExit for a flag that is neither mapped (FLAG2KEY) nor a known
    runtime flag — a passed flag must never be silently discarded."""
    known = set(FLAG2KEY) | RUNTIME_FLAGS
    out = set()
    for a in argv:
        if not (a.startswith("-") and len(a) > 1 and not a[1].isdigit()):
            continue
        tok = a.lstrip("-").split("=")[0]
        if tok in known:
            out.add(tok)
            continue
        cands = [k for k in known if k.startswith(tok)]
        if len(cands) == 1:
            out.add(cands[0])
        elif not cands:
            raise SystemExit(
                f"flag -{tok} is not mapped to a Config field; extend "
                "FLAG2KEY/RUNTIME_FLAGS in cli/train.py"
            )
        # ambiguous prefixes are argparse's error to raise
    return out


def build_config(opt, src_vocab_size: int, tgt_vocab_size: int) -> Config:
    return Config(
        model=ModelConfig(
            model_type=opt.model_type,
            rnn_type=opt.rnn_type,
            src_vocab_size=src_vocab_size,
            tgt_vocab_size=tgt_vocab_size,
            emb_dim=opt.word_vec_size,
            hidden_dim=opt.rnn_size,
            enc_layers=opt.enc_layers,
            dec_layers=opt.dec_layers,
            dropout=opt.dropout,
            word_dropout=opt.word_dropout,
            input_feed=bool(opt.input_feed),
            attn_type=opt.global_attention,
            latent_dim=opt.z_latent_dim,
            img_feat_dim=opt.img_feat_dim if opt.train_img_feats else 0,
            img_feat_type=opt.img_feat_type,
            img_pool=opt.img_pool,
            use_img_predict=bool(opt.use_img_predict) and bool(opt.train_img_feats),
            img_loss=opt.img_loss,
            img_loss_weight=opt.img_loss_weight,
            z_cond=opt.z_cond,
            share_decoder_embeddings=bool(opt.share_decoder_embeddings),
            share_embeddings=bool(opt.share_embeddings),
            compute_dtype=opt.compute_dtype,
            use_pallas=bool(opt.use_pallas),
            fused_ce=bool(opt.fused_ce),
        ),
        train=TrainConfig(
            seed=opt.seed,
            batch_size=opt.batch_size,
            grad_accum=opt.grad_accum,
            steps_per_call=opt.steps_per_call,
            skip_nonfinite=bool(opt.skip_nonfinite),
            fix_word_vecs_enc=bool(opt.fix_word_vecs_enc),
            fix_word_vecs_dec=bool(opt.fix_word_vecs_dec),
            max_steps=opt.max_steps,
            epochs=opt.epochs,
            optimizer=opt.optim,
            learning_rate=opt.learning_rate,
            adam_beta1=opt.adam_beta1,
            adam_beta2=opt.adam_beta2,
            param_init=opt.param_init,
            max_grad_norm=opt.max_grad_norm,
            lr_decay=opt.learning_rate_decay,
            start_decay_at=opt.start_decay_at,
            label_smoothing=opt.label_smoothing,
            kl_anneal=opt.kl_anneal,
            kl_anneal_steps=opt.kl_anneal_steps,
            kl_anneal_start=opt.kl_anneal_start,
            kl_free_bits=opt.kl_free_bits,
            ema_decay=opt.ema_decay,
            ema_ramp=bool(opt.ema_ramp),
            pack=bool(opt.pack),
            pack_segments=opt.pack_segments,
            report_every=opt.report_every,
            valid_every=opt.valid_every,
            checkpoint_every=opt.checkpoint_every,
            keep_checkpoints=opt.keep_checkpoints,
            num_data_shards=opt.num_shards,
            num_model_shards=opt.tensor_parallel,
        ),
        data=DataConfig(save_data=opt.data, buckets=[int(b) for b in opt.buckets.split(",")]),
    )


def main(argv=None) -> None:
    from variational_mmt_tpu.utils.platform import honor_env_platform

    honor_env_platform()
    p = argparse.ArgumentParser("vmmt-tpu train")
    add_args(p)
    opt = p.parse_args(argv)
    import sys as _sys

    raw_argv = list(argv) if argv is not None else _sys.argv[1:]
    passed = passed_flags(raw_argv)
    if "learning_rate" not in passed:
        # reference parity: Optim runs adadelta at lr 1.0 and adagrad at
        # ~0.1 (the shared adam default 4e-4 would cripple both). Re-applied
        # after any -config merge below: a preset written for a DIFFERENT
        # optimizer must not pin its lr onto this family.
        if opt.optim == "adadelta":
            opt.learning_rate = 1.0
        elif opt.optim == "adagrad":
            opt.learning_rate = 0.1

    sv = Vocab.load(opt.data + ".vocab.src.json")
    tv = Vocab.load(opt.data + ".vocab.tgt.json")
    train_ds = BinarizedDataset.load(opt.data + ".train.npz")
    valid_ds = None
    if BinarizedDataset.exists(opt.data + ".valid.npz"):
        valid_ds = BinarizedDataset.load(opt.data + ".valid.npz")

    train_feats = load_features(opt.train_img_feats) if opt.train_img_feats else None
    valid_feats = load_features(opt.valid_img_feats) if opt.valid_img_feats else None
    if train_feats is not None:
        assert len(train_feats) == len(train_ds), (
            f"feature rows ({len(train_feats)}) != corpus lines ({len(train_ds)}): "
            "features must be aligned to corpus line order"
        )
    if valid_feats is not None and valid_ds is not None:
        # same invariant for validation: a misaligned table would feed the
        # native gather out-of-bounds indices (unchecked memcpy)
        assert len(valid_feats) == len(valid_ds), (
            f"valid feature rows ({len(valid_feats)}) != valid corpus lines "
            f"({len(valid_ds)}): features must align to corpus line order"
        )

    cfg = build_config(opt, len(sv), len(tv))
    if opt.config:
        # config file as base; EVERY explicitly-passed CLI flag overrides it
        raw_text = open(opt.config).read()
        base = Config.from_json(raw_text)
        import json as _json

        # which keys the FILE actually set (from_json fills dataclass
        # defaults, losing the distinction needed for family-default lr)
        file_train_keys = set(_json.loads(raw_text).get("train", {}))
        file_cfg = base.to_dict()
        cli_cfg = cfg.to_dict()
        for flag in passed:
            if flag in FLAG2KEY:
                sect, key = FLAG2KEY[flag]
                file_cfg[sect][key] = cli_cfg[sect][key]
        # vocab sizes always come from the data
        file_cfg["model"]["src_vocab_size"] = len(sv)
        file_cfg["model"]["tgt_vocab_size"] = len(tv)
        if not opt.train_img_feats:
            # a preset written for multimodal training must not leave the
            # model expecting features this run doesn't have (the same guard
            # build_config applies to the no-config path)
            file_cfg["model"]["img_feat_dim"] = 0
            file_cfg["model"]["use_img_predict"] = False
        cfg = Config.from_dict(file_cfg)
        if ("learning_rate" not in passed
                and cfg.train.optimizer in ("adadelta", "adagrad")
                and (base.train.optimizer != cfg.train.optimizer
                     or "learning_rate" not in file_train_keys)):
            # the file's lr was written for a different optimizer family —
            # or the file never set one and from_json filled the adam
            # default (4e-4, which cripples adadelta/adagrad): the family
            # default applies, not the filled-in value
            cfg.train.learning_rate = 1.0 if cfg.train.optimizer == "adadelta" else 0.1
    if cfg.model.share_embeddings and sv.itos != tv.itos:
        # checked on the EFFECTIVE config (a -config file can enable sharing
        # without the CLI flag). Equal SIZES are not enough (both commonly
        # hit the vocab-size cap): sharing one table across different
        # id->token maps silently embeds source tokens as unrelated target
        # words
        raise SystemExit(
            "share_embeddings requires identical source/target vocabs: "
            "re-run preprocess with -share_vocab"
        )
    buckets = cfg.data.buckets

    # iterators carry only indices; the feature tables live device-resident
    # in the Trainer (per-step host transfer = ids, not 2MB of features)
    if cfg.train.pack:
        if cfg.model.rnn_type != "gru":
            raise SystemExit("-pack requires -rnn_type gru (segment-reset "
                             "recurrences are GRU-only)")
        from variational_mmt_tpu.data.packing import PackedBucketIterator

        train_iter = PackedBucketIterator(
            train_ds, cfg.train.batch_size, buckets, seed=cfg.train.seed,
            max_segments=cfg.train.pack_segments)
    else:
        train_iter = BucketIterator(train_ds, cfg.train.batch_size, buckets, seed=cfg.train.seed)
    valid_iter = None
    if valid_ds is not None:
        valid_iter = BucketIterator(valid_ds, cfg.train.batch_size, buckets, shuffle=False)

    if cfg.train.epochs > 0:
        # exact steps/epoch: each bucket pads its own final partial batch,
        # so len(iterator) (sum of per-bucket ceil-divisions) is the truth —
        # len(ds)//batch_size undercounts by up to n_buckets-1
        cfg.train.max_steps = cfg.train.epochs * max(1, len(train_iter))
    model = build_model(cfg.model)
    if cfg.train.num_model_shards > 1:
        from variational_mmt_tpu.parallel.tp import make_mesh_2d

        import jax

        n_model = cfg.train.num_model_shards
        if not cfg.train.num_data_shards and len(jax.devices()) < n_model:
            # floor-division would produce a size-0 mesh and a bare
            # ZeroDivisionError later; fail with the real cause instead
            raise SystemExit(
                f"-tensor_parallel {n_model} exceeds the {len(jax.devices())} "
                "available devices"
            )
        n_data = cfg.train.num_data_shards or len(jax.devices()) // n_model
        mesh = make_mesh_2d(n_data, n_model, data_axis=cfg.train.data_axis)
    else:
        mesh = make_mesh(cfg.train.num_data_shards)
    print(f"devices: {[str(d) for d in mesh.devices.flatten()]}")
    print(f"model: {cfg.model.model_type}; steps: {cfg.train.max_steps}")

    os.makedirs(opt.save_model, exist_ok=True)

    def ckpt_fn(state, step, _):
        path = save_checkpoint(opt.save_model, state, cfg, sv, tv, keep=cfg.train.keep_checkpoints)
        print(f"saved checkpoint {path}")

    from variational_mmt_tpu.utils.metrics_log import MetricsLogger
    from variational_mmt_tpu.utils.profiling import trace

    logger = (MetricsLogger(opt.metrics_log, opt.tensorboard_dir)
              if (opt.metrics_log or opt.tensorboard_dir) else None)

    bleu_fn = None
    if opt.valid_bleu and valid_ds is not None:
        from variational_mmt_tpu.config import DecodeConfig
        from variational_mmt_tpu.decode.translator import Translator
        from variational_mmt_tpu.evals.bleu import corpus_bleu

        greedy_cfg = DecodeConfig(beam_size=1, max_length=max(buckets), batch_size=cfg.train.batch_size)
        _translator = Translator(model, None, sv, tv, greedy_cfg, buckets=buckets)
        _val_src = [list(map(int, s)) for s in valid_ds.src]
        _val_refs = [tv.decode(t) for t in valid_ds.tgt]

        def bleu_fn(state):
            _translator.params = state.params
            out = _translator.translate_ids(_val_src, valid_feats)
            hyps = [tv.decode(nbest[0][1]) for nbest in out]
            return corpus_bleu(hyps, [[r] for r in _val_refs])["bleu"]

    trainer = Trainer(cfg, model, train_iter, valid_iter, mesh=mesh,
                      checkpoint_fn=ckpt_fn, metrics_logger=logger, bleu_fn=bleu_fn,
                      valid_iw=opt.valid_iw,
                      train_feats=train_feats, valid_feats=valid_feats)

    with trace(opt.profile_dir):
        if opt.train_from:
            path = opt.train_from
            if not os.path.exists(os.path.join(path, "state.msgpack")):
                path = latest_checkpoint(path) or path
            state, _, _, _, _ = load_checkpoint(path)
            from variational_mmt_tpu.train.checkpoint import is_released

            if is_released(path):
                print("WARNING: resuming from a RELEASED checkpoint "
                      "(optimizer state was stripped by "
                      "tools/release_checkpoint.py) — the optimizer "
                      "restarts from zero; params keep the artifact dtype")
            print(f"resuming from {path} at step {int(state.step)}")
            trainer.train_from(state)
        elif opt.pre_word_vecs_enc or opt.pre_word_vecs_dec:
            from variational_mmt_tpu.data.embeddings import apply_pretrained
            from variational_mmt_tpu.train.trainer import create_train_state

            state = create_train_state(cfg, model)
            state = state.replace(params=apply_pretrained(
                state.params,
                enc=np.load(opt.pre_word_vecs_enc) if opt.pre_word_vecs_enc else None,
                dec=np.load(opt.pre_word_vecs_dec) if opt.pre_word_vecs_dec else None,
            ))
            print("loaded pretrained word vectors "
                  f"(enc={bool(opt.pre_word_vecs_enc)}, dec={bool(opt.pre_word_vecs_dec)})")
            trainer.train_from(state)
        else:
            trainer.train()
    if logger is not None:
        logger.close()
    ckpt_fn(trainer.final_state, int(trainer.final_state.step), {})
    print("training done")


if __name__ == "__main__":
    main()
