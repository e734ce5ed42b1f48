"""The VMMT model family (SURVEY.md §2.4 behavioral contract).

One flax module covers the reference's three model types:

- ``nmt``     — text-only bi-GRU encoder + attention GRU decoder baseline.
- ``vmmt_f``  — latent z with *fixed* prior N(0, I); q(z|x,y,v) inference net.
- ``vmmt_c``  — *conditional* prior p(z|x,v) network; KL(q || p_cond).

z conditions the decoder through the encoder->decoder bridge (projected into
every layer's initial state), optionally also added to each step's input
projection (``z_cond='init+input'``). An optional image head p(v|z) provides
the multi-task image-prediction objective. Decode-time "latent mean
substitution" (SURVEY.md §3.3) = calling with the prior mean instead of a
posterior sample — exposed via :meth:`prior_latent`.

rngs: 'dropout' (regular dropout), 'latent' (reparameterization noise),
'word_dropout' (tgt-input token -> <unk> replacement, a posterior-collapse
countermeasure).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from variational_mmt_tpu.config import ModelConfig
from variational_mmt_tpu.data.vocab import PAD, UNK
from variational_mmt_tpu.models.attention import GlobalAttention  # noqa: F401  (re-export)
from variational_mmt_tpu.models.decoder import GRUDecoder
from variational_mmt_tpu.models.gru import BiGRUEncoder, masked_mean, segment_mean
from variational_mmt_tpu.models.latent import (
    ConditionalPrior,
    ImagePredictor,
    InferenceNetwork,
    RegionAttentionPool,
    reparameterize,
)


def _dtype(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16}[name]


class VMMTModel(nn.Module):
    cfg: ModelConfig

    @property
    def is_latent(self) -> bool:
        return self.cfg.model_type in ("vmmt_f", "vmmt_c")

    def setup(self):
        c = self.cfg
        dt = _dtype(c.compute_dtype)
        self.dt = dt
        # share_embeddings (reference -share_embeddings): ONE table serves
        # both sides — src lookups go through tgt_embed and no src table is
        # ever allocated (requires a shared vocab; validated in config)
        self.tgt_embed = nn.Embed(c.tgt_vocab_size, c.emb_dim, dtype=dt, name="tgt_embed")
        if c.share_embeddings:
            self.src_embed = self.tgt_embed
        else:
            self.src_embed = nn.Embed(c.src_vocab_size, c.emb_dim, dtype=dt, name="src_embed")
        self.encoder = BiGRUEncoder(
            c.hidden_dim, c.enc_layers, c.dropout, dt, c.use_pallas, c.scan_unroll,
            c.rnn_type, name="encoder"
        )
        self.decoder = GRUDecoder(
            c.hidden_dim, c.dec_layers, c.dropout, c.attn_type, c.input_feed, dt,
            c.scan_unroll, c.use_pallas, c.pallas_decoder, c.fused_decoder,
            c.rnn_type, name="decoder"
        )
        # generator GEMM in compute dtype (bf16 on MXU is ~several-fold
        # faster than an f32 3-pass matmul); logits upcast to f32 for the
        # softmax/CE which stay in f32
        if c.share_decoder_embeddings:
            # tied generator (reference -share_decoder_embeddings): kernel is
            # the tgt embedding table transposed; only a bias is allocated
            self.gen_bias = self.param(
                "gen_bias", nn.initializers.zeros, (c.tgt_vocab_size,)
            )
        else:
            self.generator = nn.Dense(c.tgt_vocab_size, dtype=dt, name="generator")
        bridge_layers = []
        for l in range(c.dec_layers):
            bridge_layers.append(nn.Dense(c.hidden_dim, dtype=dt, name=f"bridge{l}"))
        self.bridge_layers = bridge_layers

        if self.is_latent:
            use_img = c.img_feat_dim > 0
            self.tgt_encoder = BiGRUEncoder(
                c.hidden_dim, 1, c.dropout, dt, c.use_pallas, c.scan_unroll,
                c.rnn_type, name="tgt_encoder"
            )
            self.infnet = InferenceNetwork(
                c.latent_dim, c.hidden_dim, c.min_sigma, use_img, dt, name="infnet"
            )
            if c.model_type == "vmmt_c":
                self.prior_net = ConditionalPrior(
                    c.latent_dim, c.hidden_dim, c.min_sigma, use_img, dt, name="prior"
                )
            if c.use_img_predict:
                self.img_predictor = ImagePredictor(c.img_feat_dim, c.hidden_dim, dt, name="img_pred")
            if c.img_pool == "attn":
                self.region_pool = RegionAttentionPool(
                    min(256, c.hidden_dim), dt, name="region_pool"
                )
            if c.z_cond == "init+input":
                from variational_mmt_tpu.models.gru import n_gates

                self.z_input_proj = nn.Dense(
                    n_gates(c.rnn_type) * c.hidden_dim, use_bias=False, dtype=dt,
                    name="z_input_proj"
                )

    # ------------------------------------------------------------------
    # components (each is also an `apply(..., method=...)` entry point for
    # the translator / IW evaluator)
    # ------------------------------------------------------------------
    def encode(self, src: jax.Array, deterministic: bool = True):
        """src (B,S) -> (memory (B,S,H), finals [L x (B,H)], src_mask (B,S),
        src_summary (B,H))."""
        src_mask = (src != PAD).astype(jnp.float32)
        emb = self.src_embed(src)
        memory, finals = self.encoder(emb, src_mask, deterministic=deterministic)
        return memory, finals, src_mask, masked_mean(memory, src_mask)

    def _img_in(self, img: Optional[jax.Array], query: Optional[jax.Array] = None) -> Optional[jax.Array]:
        if img is None:
            return None
        if img.ndim == 3:  # conv features (B, R, D)
            if self.cfg.img_pool == "attn" and query is not None:
                # text-conditioned attention over the local regions keeps
                # the 7x7 spatial structure usable (SURVEY.md §2.1 #6)
                img = self.region_pool(img, query)
            else:
                img = img.mean(axis=1)
        return img

    def posterior(self, src_summary, tgt: jax.Array, img, deterministic: bool = True):
        """q(z|x,y,v) parameters. tgt: gold target ids (B,T), PAD-masked."""
        tgt_mask = (tgt != PAD).astype(jnp.float32)
        emb = self.tgt_embed(tgt)
        tgt_enc, _ = self.tgt_encoder(emb, tgt_mask, deterministic=deterministic)
        tgt_summary = masked_mean(tgt_enc, tgt_mask)
        return self.infnet(src_summary, tgt_summary, self._img_in(img, src_summary))

    def prior_params(self, src_summary, img):
        """(mu_p, sigma_p): learned for vmmt_c, N(0, I) for vmmt_f."""
        B = src_summary.shape[0]
        if self.cfg.model_type == "vmmt_c":
            return self.prior_net(src_summary, self._img_in(img, src_summary))
        z_shape = (B, self.cfg.latent_dim)
        return jnp.zeros(z_shape, jnp.float32), jnp.ones(z_shape, jnp.float32)

    def prior_latent(self, src_summary, img):
        """Decode-time latent-mean substitution: z = E_p[z]."""
        mu_p, _ = self.prior_params(src_summary, img)
        return mu_p

    def init_decoder_state(self, finals: List[jax.Array], z: Optional[jax.Array]):
        """Bridge: enc finals (+ z) -> per-layer decoder init states.
        For LSTM, the bridge initializes the hidden half; the cell half
        starts at zero (decoder state packed as [h | c])."""
        init_hs = []
        for l in range(self.cfg.dec_layers):
            f = finals[min(l, len(finals) - 1)]
            if z is not None:
                f = jnp.concatenate([f, z.astype(f.dtype)], axis=-1)
            h = jnp.tanh(self.bridge_layers[l](f))
            if self.cfg.rnn_type == "lstm":
                h = jnp.concatenate([h, jnp.zeros_like(h)], axis=-1)
            init_hs.append(h)
        return init_hs

    def _gen(self, h: jax.Array) -> jax.Array:
        """Generator logits in f32 (tied or free kernel)."""
        if self.cfg.share_decoder_embeddings:
            w = self.tgt_embed.embedding.astype(self.dt)  # (V, E)
            return (h @ w.T).astype(jnp.float32) + self.gen_bias
        return self.generator(h).astype(jnp.float32)

    def z_extra_proj(self, z: Optional[jax.Array]):
        if z is not None and self.cfg.z_cond == "init+input":
            return self.z_input_proj(z.astype(self.dt))
        return None

    def decode_train(self, tgt_in, memory, src_mask, init_hs, z, deterministic: bool,
                     return_pre_gen: bool = False):
        emb = self.tgt_embed(tgt_in)
        outs, aligns = self.decoder(
            emb, memory, src_mask, init_hs,
            deterministic=deterministic, extra_input_proj=self.z_extra_proj(z),
        )
        if return_pre_gen:
            # fused-CE path: the generator GEMM happens inside the loss
            # (ops/fused_ce.py); still materialize the generator params at
            # init time so the checkpoint layout is identical either way
            if self.is_initializing():
                self._gen(outs[:, :1])
            return outs, aligns
        logits = self._gen(outs)
        return logits, aligns

    def decode_step(self, carry, tok: jax.Array, memory, src_mask, z, keys=None):
        """One inference step: tok (B,) int32 -> (carry, logits (B,V)).
        ``keys``: optional pre-projected attention memory
        (:meth:`project_memory`, compute once per sequence)."""
        emb = self.tgt_embed(tok)
        carry, (attn_h, align) = self.decoder.one_step(
            carry, emb, memory, src_mask,
            extra_input_proj=self.z_extra_proj(z), keys=keys,
        )
        logits = self._gen(attn_h)
        return carry, logits, align

    def project_memory(self, memory, with_values: bool = False):
        return self.decoder.project_memory(memory, with_values)

    def init_decode_carry(self, init_hs):
        return self.decoder.init_carry(init_hs)

    def predict_img(self, z):
        return self.img_predictor(z)

    # ------------------------------------------------------------------
    # training forward
    # ------------------------------------------------------------------
    def __call__(
        self,
        src: jax.Array,
        tgt_in: jax.Array,
        img: Optional[jax.Array] = None,
        deterministic: bool = True,
        sample: bool = True,
        tgt_out: Optional[jax.Array] = None,
    ) -> Dict[str, jax.Array]:
        """Full training-path forward. Returns logits + distribution params
        (+ image prediction); ELBO assembly lives in train/loss.py.

        ``tgt_out``: the gold target (y + EOS, PAD-masked) the posterior
        conditions on. When omitted it is reconstructed by left-shifting
        ``tgt_in`` — which drops the final EOS, so callers that have the
        real tgt_out should pass it."""
        c = self.cfg
        memory, finals, src_mask, src_summary = self.encode(src, deterministic)

        out: Dict[str, jax.Array] = {}
        z = None
        if self.is_latent:
            # pool conv regions ONCE (mean or text-conditioned attention per
            # img_pool) and thread the SAME vector through q / prior / the
            # p(v|z) target — the image objective must reconstruct exactly
            # what z was conditioned on, not an independently mean-pooled v
            v_in = self._img_in(img, src_summary)
            # q consumes the *gold* target y+EOS (reference: the inference
            # net reads the full gold sequence, SURVEY.md §2.4)
            if tgt_out is not None:
                gold = tgt_out
            else:
                gold = jnp.concatenate([tgt_in[:, 1:], jnp.zeros_like(tgt_in[:, :1])], axis=1)
            mu_q, sigma_q = self.posterior(src_summary, gold, v_in, deterministic)
            mu_p, sigma_p = self.prior_params(src_summary, v_in)
            if sample:
                z = reparameterize(self.make_rng("latent"), mu_q, sigma_q)
            else:
                z = mu_q
            out.update(mu_q=mu_q, sigma_q=sigma_q, mu_p=mu_p, sigma_p=sigma_p, z=z)
            if c.use_img_predict:
                out["img_pred"] = self.predict_img(z)
                if v_in is not None:
                    # the target must be a CONSTANT for the image loss: with
                    # img_pool=attn, v_in is parameter-dependent
                    # (region_pool over src_summary) and an un-stopped
                    # gradient would let the target chase the prediction —
                    # collapsing the region attention onto whatever is
                    # easiest to reconstruct instead of grounding z.
                    # region_pool still learns through q/prior consumption.
                    out["img_target"] = jax.lax.stop_gradient(v_in)

        if (not deterministic) and c.word_dropout > 0.0:
            keep = jax.random.bernoulli(
                self.make_rng("word_dropout"), 1.0 - c.word_dropout, tgt_in.shape
            )
            # never drop BOS/PAD; dropped tokens become <unk>
            drop = (~keep) & (tgt_in != PAD)
            drop = drop.at[:, 0].set(False)
            tgt_in = jnp.where(drop, UNK, tgt_in)

        init_hs = self.init_decoder_state(finals, z)
        dec, aligns = self.decode_train(
            tgt_in, memory, src_mask, init_hs, z, deterministic,
            return_pre_gen=c.fused_ce,
        )
        if c.fused_ce:
            out["dec_out"] = dec
        else:
            out["logits"] = dec
        out["aligns"] = aligns
        return out


    # ------------------------------------------------------------------
    # sequence-packed training forward (train.pack)
    # ------------------------------------------------------------------
    def forward_packed(
        self,
        src: jax.Array,  # (B, S) packed source rows
        tgt_in: jax.Array,  # (B, T) packed BOS+y rows
        src_seg: jax.Array,  # (B, S) segment ids, -1 at pads
        tgt_seg: jax.Array,  # (B, T)
        seg_first: jax.Array,  # (B, K) first src position per segment
        seg_last: jax.Array,  # (B, K) last src position per segment
        img: Optional[jax.Array] = None,  # (B, K, D) or (B, K, R, D)
        deterministic: bool = True,
        sample: bool = True,
        tgt_out: Optional[jax.Array] = None,  # (B, T) gold, REQUIRED for latent
    ) -> Dict[str, jax.Array]:
        """Training forward over a sequence-PACKED batch (multiple sentences
        per row, TPU padding-waste elimination). Per-sentence quantities
        (latent params, z, image prediction) come out flattened (B·K, ...)
        so the ELBO assembly treats every packed segment exactly like an
        unpacked row; token-level outputs keep the packed (B, T, ...) shape.
        Mathematically identical to the unpacked forward per segment
        (tests/test_pack.py proves loss + grad equivalence)."""
        c = self.cfg
        B, K = seg_first.shape
        src_mask = (src_seg >= 0).astype(jnp.float32)
        emb = self.src_embed(src)
        memory, finals = self.encoder(
            emb, src_mask, deterministic=deterministic, seg=src_seg,
            seg_bounds=(seg_first, seg_last))  # finals: per layer (B,K,H)
        src_summary = segment_mean(memory, src_seg, K).reshape(B * K, -1)
        finals_flat = [f.reshape(B * K, -1) for f in finals]

        out: Dict[str, jax.Array] = {}
        z = None
        if self.is_latent:
            img_flat = None
            if img is not None:
                img_flat = img.reshape((B * K,) + img.shape[2:])
            v_in = self._img_in(img_flat, src_summary)
            if tgt_out is None:
                raise ValueError("forward_packed requires tgt_out (the gold "
                                 "target the posterior conditions on)")
            # q(z|x,y,v) over the PACKED gold target: segment-reset encoder
            # + per-segment summaries, one z per packed sentence
            tgt_mask = (tgt_seg >= 0).astype(jnp.float32)
            gold_emb = self.tgt_embed(tgt_out)
            tgt_enc, _ = self.tgt_encoder(
                gold_emb, tgt_mask, deterministic=deterministic, seg=tgt_seg)
            tgt_summary = segment_mean(tgt_enc, tgt_seg, K).reshape(B * K, -1)
            mu_q, sigma_q = self.infnet(src_summary, tgt_summary, v_in)
            mu_p, sigma_p = self.prior_params(src_summary, v_in)
            if sample:
                z = reparameterize(self.make_rng("latent"), mu_q, sigma_q)
            else:
                z = mu_q
            out.update(mu_q=mu_q, sigma_q=sigma_q, mu_p=mu_p, sigma_p=sigma_p, z=z)
            if c.use_img_predict:
                out["img_pred"] = self.predict_img(z)
                if v_in is not None:
                    out["img_target"] = jax.lax.stop_gradient(v_in)

        if (not deterministic) and c.word_dropout > 0.0:
            keep = jax.random.bernoulli(
                self.make_rng("word_dropout"), 1.0 - c.word_dropout, tgt_in.shape
            )
            # never drop PAD or a segment's BOS (packed rows carry one BOS
            # per segment, not only at column 0)
            prev = jnp.pad(tgt_seg[:, :-1], ((0, 0), (1, 0)), constant_values=-2)
            is_start = (tgt_seg >= 0) & (tgt_seg != prev)
            drop = (~keep) & (tgt_in != PAD) & (~is_start)
            tgt_in = jnp.where(drop, UNK, tgt_in)

        # bridge on flattened segments -> per-layer (B, K, H) init states
        init_flat = self.init_decoder_state(finals_flat, z)
        init_seg = [h.reshape(B, K, -1) for h in init_flat]
        z_proj_seg = None
        zp = self.z_extra_proj(z)
        if zp is not None:
            z_proj_seg = zp.reshape(B, K, -1)
        dec_emb = self.tgt_embed(tgt_in)
        outs, aligns = self.decoder.packed_seq(
            dec_emb, memory, src_seg, tgt_seg, init_seg,
            deterministic=deterministic, extra_input_proj_seg=z_proj_seg,
        )
        if c.fused_ce:
            if self.is_initializing():
                self._gen(outs[:, :1])
            out["dec_out"] = outs
        else:
            out["logits"] = self._gen(outs)
        out["aligns"] = aligns
        return out


def build_model(cfg: ModelConfig) -> VMMTModel:
    cfg.validate()
    return VMMTModel(cfg)


def generator_params(params, cfg: ModelConfig):
    """The {kernel (H,V), bias (V,)} the fused-CE loss consumes, resolving
    the tied-generator layout (share_decoder_embeddings)."""
    if cfg.share_decoder_embeddings:
        return {"kernel": params["tgt_embed"]["embedding"].T,
                "bias": params["gen_bias"]}
    return params["generator"]


def init_params(model: VMMTModel, rng: jax.Array, batch_size: int = 2, seq_len: int = 8):
    """Initialize parameters with dummy shapes (shapes don't constrain later
    use — everything re-traces per bucket)."""
    c = model.cfg
    src = jnp.ones((batch_size, seq_len), jnp.int32)
    tgt_in = jnp.ones((batch_size, seq_len), jnp.int32)
    img = None
    if model.is_latent or c.use_img_predict:
        # conv features are (B, R, D): init with the 3-D shape so the
        # region-pooling params (img_pool='attn') materialize
        shape = ((batch_size, 2, c.img_feat_dim) if c.img_feat_type == "conv"
                 else (batch_size, c.img_feat_dim))
        img = jnp.ones(shape, jnp.float32)

    def _init(k1, k2, k3, k4):
        return model.init(
            {"params": k1, "dropout": k2, "latent": k3, "word_dropout": k4},
            src, tgt_in, img, deterministic=True, sample=True,
        )

    # jit the init: eager init compiles every op (incl. both scans) separately
    variables = jax.jit(_init)(*jax.random.split(rng, 4))
    return variables["params"]
