"""Dataclass configuration system.

Mirrors the flag surface of the reference's ``opts.py`` (SURVEY.md §2.5:
model type ∈ {nmt, vmmt_f, vmmt_c}, latent dim, KL-annealing schedule,
image-loss type/weight, feature paths, RNN size/layers, embedding size,
dropout, batch size, optimizer/LR, epochs/steps, seed; translate: beam size,
n-best, max length). Like the reference — which pickles the full ``opt``
Namespace into every checkpoint so ``translate`` can rebuild the exact model —
the full ``Config`` serializes to JSON inside our checkpoints.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional


def consumes_decode_feats(mcfg: "ModelConfig") -> bool:
    """True when DECODE needs the image tensor: only the conditional prior
    p(z|x,v) (vmmt_c) reads v at decode time; vmmt_f substitutes the N(0,I)
    prior mean and nmt has no latent (SURVEY §2.4). The single home for this
    rule — the translate CLI's missing-features guard, the ensemble
    interface check (cli/loading.py) and serving's feature-shape selection
    (serve/service.py) all call it."""
    return mcfg.model_type == "vmmt_c" and mcfg.img_feat_dim > 0


@dataclass
class ModelConfig:
    """Architecture hyperparameters.

    Defaults follow SURVEY.md §2.6 (paper-era typical values; the reference
    opts were unverifiable because the mount was empty).
    """

    model_type: str = "vmmt_f"  # one of: nmt | vmmt_f | vmmt_c
    rnn_type: str = "gru"  # gru | lstm (reference -rnn_type; the paper's
    # models are GRU — LSTM is the upstream baseline option. Pallas fused
    # kernels are GRU-only: LSTM recurrences run as XLA scans.)
    src_vocab_size: int = 10000
    tgt_vocab_size: int = 10000
    emb_dim: int = 500
    hidden_dim: int = 500
    enc_layers: int = 2
    dec_layers: int = 2
    dropout: float = 0.3
    word_dropout: float = 0.0  # replace tgt-input tokens by <unk> (VI trick)
    input_feed: bool = True
    attn_type: str = "general"  # Luong global attention variant

    # --- latent variable machinery (SURVEY.md §2.1 #10) ---
    latent_dim: int = 128
    img_feat_dim: int = 2048  # ResNet-50 pool5
    img_feat_type: str = "pool5"  # pool5 (global 2048) | conv (49x2048)
    img_pool: str = "mean"  # conv-region pooling: mean | attn (a
    # text-conditioned attention over the 49 regions, SURVEY.md §2.1 #6)
    use_img_predict: bool = True  # image-prediction head p(v|z)
    img_loss: str = "logprob"  # logprob | mse | cosine
    img_loss_weight: float = 1.0  # gamma
    z_cond: str = "init"  # init | init+input : how z conditions the decoder
    min_sigma: float = 1e-3  # numerical floor on predicted std-devs
    share_decoder_embeddings: bool = False  # tie the generator kernel to the
    # target embedding table (reference -share_decoder_embeddings); requires
    # emb_dim == hidden_dim
    share_embeddings: bool = False  # ONE embedding table for source and
    # target (reference -share_embeddings); requires a shared vocab
    # (preprocess -share_vocab) so src/tgt vocab sizes match

    # --- TPU-specific ---
    compute_dtype: str = "bfloat16"  # activations/matmuls on MXU (params stay f32)
    use_pallas: bool = False  # fused Pallas GRU kernels for encoder scans
    pallas_decoder: bool = False  # when use_pallas: also fuse the eligible
    # input-feed decoder (ops/pallas/decoder.py). Default OFF: measured
    # ~20% SLOWER than the XLA scan at flagship shape (fwd 2.4 vs 2.0 ms,
    # grad 5.4 vs 4.5) because the VMEM-resident keys/mem_v force ~64-row
    # batch chunks, multiplying the serial chain 4x. Kept (exactness-tested)
    # for shapes with small S*H where the whole batch fits.
    scan_unroll: int = 1  # lax.scan unroll factor for the recurrences
    fused_ce: bool = False  # fuse the generator GEMM with the softmax-CE in
    # row chunks (ops/fused_ce.py): the (B*T, V) f32 logits tensor is never
    # materialized or saved for backward (recompute-in-bwd, Liger-style)
    fused_decoder: bool = False  # custom-VJP decoder scan with hoisted
    # weight-grad einsums (2-layer general-attention input-feed only).
    # Verified exact (grads to 6e-8) but measured NO speedup on v5e — XLA
    # already optimizes the scan's weight-grad accumulation; kept as
    # infrastructure for other shapes/hardware

    def validate(self) -> None:
        assert self.model_type in ("nmt", "vmmt_f", "vmmt_c"), self.model_type
        assert self.rnn_type in ("gru", "lstm"), self.rnn_type
        assert self.attn_type in ("general", "dot", "mlp"), self.attn_type
        assert self.img_loss in ("logprob", "mse", "cosine"), self.img_loss
        assert self.z_cond in ("init", "init+input"), self.z_cond
        assert self.img_feat_type in ("pool5", "conv"), self.img_feat_type
        assert self.img_pool in ("mean", "attn"), self.img_pool
        if self.share_decoder_embeddings:
            assert self.emb_dim == self.hidden_dim, (
                "share_decoder_embeddings requires emb_dim == hidden_dim "
                f"(got {self.emb_dim} vs {self.hidden_dim})"
            )
        if self.share_embeddings:
            assert self.src_vocab_size == self.tgt_vocab_size, (
                "share_embeddings requires a shared vocab (preprocess "
                f"-share_vocab): src {self.src_vocab_size} != tgt {self.tgt_vocab_size}"
            )


@dataclass
class TrainConfig:
    """Optimization + loop hyperparameters (reference Optim/Trainer surface)."""

    seed: int = 1234
    batch_size: int = 64  # sentences per global batch
    max_steps: int = 20000
    epochs: int = 0  # if > 0, overrides max_steps via steps_per_epoch
    optimizer: str = "adam"  # adam | sgd | adadelta | adagrad
    learning_rate: float = 4e-4
    param_init: float = 0.0  # >0: re-init ALL params uniform(-r, r) after
    # construction (the reference's -param_init; 0 keeps the framework's
    # per-layer default init, which is usually better)
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    max_grad_norm: float = 5.0
    lr_decay: float = 0.5  # multiplicative decay on validation plateau
    start_decay_at: int = 0  # step after which plateau decay may trigger
    label_smoothing: float = 0.0

    # --- KL annealing (beta: 0 -> 1) ---
    kl_anneal: str = "linear"  # linear | sigmoid | none
    kl_anneal_steps: int = 10000
    kl_anneal_start: int = 0
    kl_free_bits: float = 0.0  # per-dim free bits (posterior-collapse guard)

    # freeze pretrained embedding tables (reference -fix_word_vecs_enc/dec):
    # a static grad mask in the jitted step, not a requires_grad flag
    fix_word_vecs_enc: bool = False
    fix_word_vecs_dec: bool = False

    skip_nonfinite: bool = False  # skip optimizer updates whose global grad
    # norm is NaN/Inf (bf16 production hygiene: one bad batch must not
    # poison the params); skipped count reported in metrics

    # --- EMA / Polyak averaging (beyond-reference production knob) ---
    ema_decay: float = 0.0  # >0 maintains an exponential moving average of
    # the params inside the jitted step (ema = d*ema + (1-d)*params after
    # every applied update; skipped-nonfinite steps leave it untouched).
    # Saved in checkpoints; decode with the averaged weights via the
    # translate/serve -use_ema flag or publish them with
    # release_checkpoint -ema. Typical values 0.999-0.9999.
    ema_ramp: bool = True  # warm the decay in as min(d, (1+n)/(10+n)) over
    # update count n (the tf.train.ExponentialMovingAverage num_updates
    # schedule): early EMA tracks the fast-moving young model instead of
    # anchoring to the init point. Measured on the quality gate (2500-step
    # vmmt_c, d=0.999): fixed decay collapses EMA BLEU to 33.9 vs raw 55.8;
    # the ramp recovers it (EXPERIMENTS.md "EMA on the gate"). Turn off only
    # for long runs where reproducing the plain recurrence matters.

    # --- sequence packing (TPU padding-waste elimination) ---
    pack: bool = False  # pack multiple sentences per row (segment-reset
    # recurrences + segment-masked attention + per-segment latents); the
    # per-sentence math is identical to unpacked batches (tests/test_pack.py
    # proves loss+grad equivalence) but each static (B, L) step carries
    # ~25-35% more real tokens at Multi30k length distributions. GRU only;
    # training-side only (decode batches are never packed).
    pack_segments: int = 4  # static max sentences per packed row

    # --- scaling ---
    grad_accum: int = 1  # micro-batches per optimizer step (effective batch
    # = batch_size; each micro sees batch_size // grad_accum examples)
    steps_per_call: int = 1  # optimizer steps per jit dispatch (lax.scan over
    # stacked batches): amortizes host->device dispatch latency; report/valid/
    # checkpoint intervals must be multiples of it

    # --- loop mechanics ---
    report_every: int = 50
    valid_every: int = 500
    checkpoint_every: int = 1000
    keep_checkpoints: int = 3

    # --- parallelism ---
    data_axis: str = "data"
    num_data_shards: int = 0  # 0 = use all local devices
    num_model_shards: int = 1  # >1: 2-D (data, model) mesh; vocab-parallel
    # embeddings + generator sharded over the model axis (parallel/tp.py)


@dataclass
class DataConfig:
    """Paths + pipeline knobs (reference preprocess.py + HDF5 features)."""

    train_src: str = ""
    train_tgt: str = ""
    valid_src: str = ""
    valid_tgt: str = ""
    train_img_feats: str = ""  # HDF5/NPY, row i aligned to train line i
    valid_img_feats: str = ""
    save_data: str = ""  # binarized dataset prefix
    src_vocab_size: int = 10000
    tgt_vocab_size: int = 10000
    src_words_min_frequency: int = 1
    tgt_words_min_frequency: int = 1
    src_seq_len: int = 64  # hard truncation (reference: filter long pairs)
    tgt_seq_len: int = 64
    bpe_merges: int = 10000
    lower: bool = True
    share_vocab: bool = False
    # bucket boundaries: examples padded to the smallest bucket >= max(len)
    buckets: List[int] = field(default_factory=lambda: [16, 24, 32, 48, 64])


@dataclass
class DecodeConfig:
    """Translate-time options (reference translate_opts)."""

    beam_size: int = 4
    n_best: int = 1
    max_length: int = 100
    min_length: int = 0
    length_penalty: str = "gnmt"  # gnmt | none | average
    alpha: float = 0.6  # GNMT length-penalty exponent
    coverage_beta: float = 0.0  # GNMT coverage-penalty weight (0 = off)
    batch_size: int = 32
    # n-gram repeat blocking (reference lineage -block_ngram_repeat):
    # g > 0 masks, at each beam step, any token that would complete a
    # g-gram already present in that hypothesis (ops/beam.py docstring).
    # ignore_when_blocking: space-separated TOKEN STRINGS whose g-grams
    # are exempt (subword/punctuation that legally repeats); converted to
    # target-vocab ids at Translator build.
    block_ngram_repeat: int = 0
    ignore_when_blocking: str = ""
    replace_unk: bool = False
    dump_beam: bool = False  # record the raw beam search tree (-dump_beam)
    iw_samples: int = 10  # K for importance-weighted ELBO eval
    # multi-checkpoint ensemble combination: "prob" averages the per-model
    # next-token distributions in probability space (logsumexp - log M, the
    # standard NMT ensemble); "logprob" averages log-probs (geometric mean)
    ensemble_mode: str = "prob"
    # decode-time weight precision: "bfloat16" casts float param leaves at
    # load (halves HBM weight traffic on the bandwidth-bound decode step);
    # logits/latent heads still compute in f32 (beyond-reference)
    infer_dtype: str = "float32"
    # fused Pallas decode-step kernel (ops/pallas/decode_step.py):
    # 0 = off; 1 = one launch per beam step for the full
    # GRU0->GRU1->attention chain; 2 = fused GRU chain only (attention
    # stays in XLA). Applies when the model has the flagship structure
    # (2-layer GRU, general attention, input_feed); ignored otherwise.
    # Runs in interpret mode off-TPU (slow -- enable there only in tests).
    pallas_step: int = 0
    # ancestral sampling (the reference lineage's -random_sampling_topk
    # family): temp > 0 switches decode from search to sampling (requires
    # beam_size == n_best == 1); 1.0 = untempered. topk/topp truncate the
    # tempered distribution (0 = off); both imply sampling_temp > 0.
    sampling_temp: float = 0.0
    sampling_topk: int = 0
    sampling_topp: float = 0.0
    # decode-time latent source for vmmt models: "mean" = the reference's
    # latent-mean substitution (z = E_p[z|x,v]); "sample" draws
    # z ~ p(z|x,v) per sentence (reparameterized, seeded by decode_seed +
    # corpus index) — the paper's generative read of the latent: different
    # seeds yield different plausible translations
    latent_from: str = "mean"
    # PRNG seed for the sampling paths; keys fold in the corpus index, so
    # outputs are invariant to batch size / bucket composition
    decode_seed: int = 1234


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)
    decode: DecodeConfig = field(default_factory=DecodeConfig)

    # ------------------------------------------------------------------
    # Serialization (the checkpoint "opt round-trip" contract, SURVEY §2.5)
    # ------------------------------------------------------------------
    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Config":
        return cls(
            model=_from_dict(ModelConfig, d.get("model", {})),
            train=_from_dict(TrainConfig, d.get("train", {})),
            data=_from_dict(DataConfig, d.get("data", {})),
            decode=_from_dict(DecodeConfig, d.get("decode", {})),
        )

    @classmethod
    def from_json(cls, s: str) -> "Config":
        return cls.from_dict(json.loads(s))

    def validate(self) -> None:
        self.model.validate()


def _from_dict(klass, d: Dict[str, Any]):
    names = {f.name for f in dataclasses.fields(klass)}
    known = {k: v for k, v in d.items() if k in names}
    return klass(**known)


def update_config(cfg, dotted: Dict[str, Any]):
    """Apply {'model.latent_dim': 64, ...} style overrides (CLI surface)."""
    for key, value in dotted.items():
        parts = key.split(".")
        obj = cfg
        for p in parts[:-1]:
            obj = getattr(obj, p)
        name = parts[-1]
        if not hasattr(obj, name):
            raise KeyError(f"unknown config key: {key}")
        current = getattr(obj, name)
        if isinstance(current, bool) and isinstance(value, str):
            # bool("False") is True — parse common spellings explicitly
            value = value.strip().lower() in ("1", "true", "yes", "on")
        elif current is not None and not isinstance(current, (list, dict)):
            value = type(current)(value) if not isinstance(value, type(current)) else value
        setattr(obj, name, value)
    return cfg
