"""Batch translation — the reference's ``Translator``/``TranslatorMultimodal``
(SURVEY.md §2.1 #15, §3.3): encode, take z from the PRIOR ("latent mean
substitution": VMMT_F -> 0-vector, VMMT_C -> mu of p(z|x,v)), tile state
across beams, run beam search, rebuild text.

TPU-native shape: the whole encode+beam pipeline is one jitted function per
(batch, src-bucket) shape; the token loop never leaves the device
(ops/beam.py). Host code only maps text <-> ids and regroups n-best output
in original corpus order.
"""

from __future__ import annotations

from collections import deque
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from variational_mmt_tpu.config import DecodeConfig
from variational_mmt_tpu.data.bpe import remove_bpe
from variational_mmt_tpu.data.dataset import (BinarizedDataset, BucketIterator,
                                               buckets_with_catchall)
from variational_mmt_tpu.data.vocab import UNK, UNK_TOK, Vocab
from variational_mmt_tpu.models.model import VMMTModel
from variational_mmt_tpu.ops.beam import (beam_search, greedy_search,
                                           sampling_search)


def _combine_logps(logps: List[jax.Array], mode: str) -> jax.Array:
    """Ensemble combination of per-model next-token log-distributions.

    ``prob``: arithmetic mean in probability space (logsumexp - log M), the
    standard NMT ensemble; ``logprob``: mean of log-probs (geometric mean of
    probabilities, unnormalized — ranking-equivalent product-of-experts).
    With one model both are the identity.
    """
    if len(logps) == 1:
        return logps[0]
    stacked = jnp.stack(logps, axis=0)
    if mode == "prob":
        return jax.nn.logsumexp(stacked, axis=0) - jnp.log(float(len(logps)))
    if mode != "logprob":
        raise ValueError(f"unknown ensemble_mode: {mode!r} (expected prob | logprob)")
    return jnp.mean(stacked, axis=0)


_QKEYS = frozenset(("int8", "scale"))


def quantize_params_int8(params):
    """Weight-only int8 (``-infer_dtype int8``): every floating leaf with
    ndim >= 2 (GEMM kernels, embedding tables, recurrent/attention weights)
    becomes ``{"int8": q, "scale": s}`` with a symmetric per-output-channel
    scale (max-abs over all axes but the last, /127). 1-D leaves (biases,
    gains) stay f32 — they are a rounding error of the footprint. The
    decode program dequantizes to bfloat16 on entry (XLA hoists that out of
    the beam loop), so compute and search behavior match the bfloat16 path
    up to int8 rounding; what changes is the PERSISTENT weight HBM: 4.0x
    smaller than f32, 2.0x smaller than bf16 — serving density. Measured
    (docs/perf_notes.md "int8: measured", real v5e): throughput parity with
    bf16 (4908 vs 4944 sent/s single, 2563 vs 2577 for 3-member ensembles),
    quality parity on the gate corpus (BLEU 64.76 vs f32's 64.60, 5/150
    sentence flips; ensemble 66.17 vs 66.02, 3/150), and a 3-member int8
    ensemble resident+serving in fewer weight bytes (84 MB) than one f32
    model (111 MB)."""
    def leaf(x):
        x = jnp.asarray(x)
        if x.ndim < 2 or not jnp.issubdtype(x.dtype, jnp.floating):
            return x
        xf = x.astype(jnp.float32)
        scale = jnp.max(jnp.abs(xf), axis=tuple(range(x.ndim - 1))) / 127.0
        scale = jnp.maximum(scale, jnp.finfo(jnp.float32).tiny)
        q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
        return {"int8": q, "scale": scale}

    return jax.tree_util.tree_map(leaf, params)


def dequantize_params(params):
    """Inverse of :func:`quantize_params_int8`, traced inside the decode
    program: rebuilds bfloat16 leaves from the int8/scale pairs; identity
    on anything unquantized (so the decode fn can call it unconditionally)."""
    def walk(node):
        if isinstance(node, dict):
            if set(node.keys()) == _QKEYS:
                return (node["int8"].astype(jnp.float32)
                        * node["scale"]).astype(jnp.bfloat16)
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(params)


def cast_params_for_inference(params, dtype_name: str):
    """Cast floating param leaves for decode (``-infer_dtype``). bfloat16
    halves HBM weight traffic on the bandwidth-bound decode step; modules
    with f32 compute declarations (latent heads, softmaxes, logits) upcast
    on use, so search stability is preserved. int8 quarters the persistent
    weight footprint instead (see quantize_params_int8). Training precision
    is governed separately by ModelConfig.compute_dtype (params there stay
    f32 for the optimizer)."""
    if dtype_name in ("", "float32"):
        return params
    if dtype_name == "int8":
        return quantize_params_int8(params)
    if dtype_name != "bfloat16":
        raise ValueError(
            f"infer_dtype must be float32 | bfloat16 | int8, got {dtype_name!r}")
    dt = jnp.bfloat16

    def leaf(x):
        return x.astype(dt) if jnp.issubdtype(x.dtype, jnp.floating) else x

    return jax.tree_util.tree_map(leaf, params)


def make_translate_fn(model, dcfg: DecodeConfig,
                      exclusion_ids: Tuple[int, ...] = ()) -> Callable:
    """Builds fn(params, src (B,S), img (B,D)|None) -> (tokens (B,K,L),
    scores (B,K)). Jit-cached per input shape by the caller.

    ``model`` may be a single VMMTModel or a list of them (checkpoint
    ensemble); with a list, ``params`` must be a matching tuple of param
    trees and the beam expands on the combined distribution
    (dcfg.ensemble_mode). Each member keeps its own encoder memory, latent
    and decoder carry — architectures may differ as long as the vocabs
    match (the caller checks that)."""
    models = list(model) if isinstance(model, (list, tuple)) else [model]
    K = dcfg.beam_size
    needs_rng = dcfg.latent_from == "sample" or dcfg.sampling_temp > 0.0
    # PRNG discipline: one key per SENTENCE, folded from (base_key, corpus
    # index) — decode output is invariant to batch/bucket composition.
    # base_key is a RUNTIME input (not baked into the trace): changing the
    # seed — e.g. MBR drawing N samples per sentence — reuses the compiled
    # program. Sub-streams: fold_in(row_key, 0) then member index for the
    # latent draw; fold_in(row_key, 1) for the token-sampling stream.

    def _fn(params, src, img, idx, base_key):
        plist = list(params) if isinstance(params, (list, tuple)) else [params]
        assert len(plist) == len(models), "one param tree per ensemble member"
        # -infer_dtype int8: rebuild bf16 weights from the int8/scale pairs
        # (identity otherwise); hoisted out of the beam loop by XLA, so only
        # the int8 tensors persist in HBM between calls
        plist = [dequantize_params(p) for p in plist]
        B = src.shape[0]
        row_keys = None
        if needs_rng:
            row_keys = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(idx)
        # per-member encode: (params, memory, z, keys, carry0); src_mask is a
        # function of src alone, identical across members
        src_mask = None
        members = []
        carry0 = []
        for j, (m, p) in enumerate(zip(models, plist)):
            memory, finals, src_mask, summary = m.apply(
                {"params": p}, src, method=VMMTModel.encode
            )
            z = None
            if m.is_latent:
                if dcfg.latent_from == "sample":
                    # z ~ p(z|x,v) reparameterized — the generative read of
                    # the latent (vs the reference's mean substitution)
                    mu_p, sigma_p = m.apply(
                        {"params": p}, summary, img,
                        method=VMMTModel.prior_params)
                    zk = jax.vmap(lambda k: jax.random.fold_in(
                        jax.random.fold_in(k, 0), j))(row_keys)
                    eps = jax.vmap(lambda k: jax.random.normal(
                        k, (m.cfg.latent_dim,), jnp.float32))(zk)
                    z = mu_p + sigma_p * eps
                else:
                    z = m.apply({"params": p}, summary, img,
                                method=VMMTModel.prior_latent)
            init_hs = m.apply({"params": p}, finals, z, method=VMMTModel.init_decoder_state)
            carry0.append(m.apply({"params": p}, init_hs, method=VMMTModel.init_decode_carry))
            # fused Pallas decode step (mode 1: full step incl. attention,
            # keys -> (keys, mem_v) 2-tuple; mode 2: GRU chain only,
            # keys -> 1-tuple); one_step dispatches on the tuple
            mode = int(dcfg.pallas_step)
            fused_step = (mode > 0
                          and m.cfg.dec_layers == 2
                          and m.cfg.attn_type == "general"
                          and m.cfg.rnn_type == "gru"
                          and m.cfg.input_feed)
            keys = m.apply({"params": p}, memory, fused_step and mode == 1,
                           method=VMMTModel.project_memory)
            if fused_step and mode == 2:
                keys = (keys,)
            members.append((m, p, memory, z, keys))
        track_attn = dcfg.replace_unk or dcfg.coverage_beta != 0.0
        single = len(models) == 1
        sampling = dcfg.sampling_temp > 0.0

        # the greedy fast path cannot honor min_length (or produce real
        # scores/attn/traces) — any of those routes through the K=1 beam.
        # The sampling path shares its step fn and handles min_length itself
        # (Translator.__init__ rejects attn/trace flags with sampling).
        if sampling or (K == 1 and not track_attn and not dcfg.dump_beam
                        and dcfg.min_length == 0
                        and dcfg.block_ngram_repeat == 0):
            def step1(carries, toks):
                new, logps = [], []
                for (m, p, memory, z, keys), c in zip(members, carries):
                    c, logits, _ = m.apply(
                        {"params": p}, c, toks, memory, src_mask, z, keys,
                        method=VMMTModel.decode_step,
                    )
                    new.append(c)
                    logps.append(jax.nn.log_softmax(logits, axis=-1))
                return tuple(new), _combine_logps(logps, dcfg.ensemble_mode)

            if sampling:
                tok_keys = jax.vmap(lambda k: jax.random.fold_in(k, 1))(row_keys)
                tokens, s_scores = sampling_search(
                    step1, tuple(carry0), B, dcfg.max_length, tok_keys,
                    temperature=dcfg.sampling_temp, topk=dcfg.sampling_topk,
                    topp=dcfg.sampling_topp, min_length=dcfg.min_length,
                )
                return tokens[:, None, :], s_scores[:, None]
            tokens, g_scores = greedy_search(step1, tuple(carry0), B,
                                             dcfg.max_length)
            return tokens[:, None, :], g_scores[:, None]

        # tile read-only context across beams (closures, not carry: no
        # per-step re-gather of the memory bank)
        mask_t = jnp.repeat(src_mask, K, axis=0)
        tiled = [
            (m, p,
             jnp.repeat(memory, K, axis=0),
             jnp.repeat(z, K, axis=0) if z is not None else None,
             # keys is a (keys, mem_v) tuple on the fused-step path
             jax.tree.map(lambda x: jnp.repeat(x, K, axis=0), keys))
            for (m, p, memory, z, keys) in members
        ]

        def step(carries, toks):
            new, logps, aligns = [], [], []
            for (m, p, mem_t, z_t, keys_t), c in zip(tiled, carries):
                c, logits, align = m.apply(
                    {"params": p}, c, toks, mem_t, mask_t, z_t, keys_t,
                    method=VMMTModel.decode_step,
                )
                new.append(c)
                logps.append(jax.nn.log_softmax(logits, axis=-1))
                aligns.append(align)
            logp = _combine_logps(logps, dcfg.ensemble_mode)
            if track_attn:
                # full attention probs: the beam derives the argmax for
                # -replace_unk and accumulates coverage when beta != 0;
                # for an ensemble, the member-mean attention
                attn = (aligns[0].astype(jnp.float32) if single
                        else jnp.mean(jnp.stack(
                            [a.astype(jnp.float32) for a in aligns], 0), 0))
                return tuple(new), logp, attn
            return tuple(new), logp

        return beam_search(
            step, tuple(carry0), B, K, dcfg.max_length, dcfg.min_length,
            dcfg.alpha, dcfg.length_penalty, return_attn=dcfg.replace_unk,
            coverage_beta=dcfg.coverage_beta, src_mask=src_mask,
            return_trace=dcfg.dump_beam,
            block_ngram_repeat=dcfg.block_ngram_repeat,
            exclusion_tokens=tuple(exclusion_ids),
        )

    # arity is part of the jit signature: the RNG paths take the (B,)
    # corpus-index array + the base PRNG key; the deterministic paths keep
    # the 3-arg form
    if needs_rng:
        def fn(params, src, img, idx, base_key):
            return _fn(params, src, img, idx, base_key)
    else:
        def fn(params, src, img):
            return _fn(params, src, img, None, None)
    return fn


class Translator:
    """Host-side orchestration: text -> bucketed batches -> device beam ->
    n-best text in original order (the reference's TranslationBuilder role).

    ``mesh``: optional 1-D device mesh — decode runs data-parallel: the
    batch is sharded on its leading axis, params are replicated, and GSPMD
    partitions the whole encode+beam program (the only cross-chip traffic
    is the all-reduce behind the beam loop's ``jnp.all(finished)`` early
    exit). The reference has no distributed decode at all (SURVEY.md §2.3);
    this is how beam-4 scales to a v5e-8."""

    def __init__(
        self,
        model,
        params,
        src_vocab: Vocab,
        tgt_vocab: Vocab,
        dcfg: Optional[DecodeConfig] = None,
        buckets: Sequence[int] = (16, 24, 32, 48, 64),
        mesh=None,
    ):
        # checkpoint ensemble: model may be a list of VMMTModels with params
        # a matching sequence of trees (the reference lineage's -models
        # ensemble decode; combination rule = dcfg.ensemble_mode)
        self.models = list(model) if isinstance(model, (list, tuple)) else [model]
        self.model = self.models[0]
        if isinstance(params, (list, tuple)):
            if len(params) != len(self.models):
                raise ValueError(
                    f"{len(self.models)} ensemble members but {len(params)} "
                    "param trees")
            params = tuple(params)
        elif len(self.models) > 1:
            # a bare tree with a model list must fail HERE, not inside the
            # traced fn (where a stripped assert would silently zip-truncate
            # the ensemble down to member 0)
            raise ValueError(
                f"{len(self.models)} ensemble members need a matching "
                "sequence of param trees, got a single tree")
        self.src_vocab = src_vocab
        self.tgt_vocab = tgt_vocab
        self.dcfg = dcfg or DecodeConfig()
        d = self.dcfg
        if d.latent_from not in ("mean", "sample"):
            raise ValueError(
                f"latent_from must be mean | sample, got {d.latent_from!r}")
        if d.latent_from == "sample" and not any(
                m.is_latent for m in self.models):
            raise ValueError(
                "-latent_from sample: this model has no latent to sample "
                "(model_type nmt decodes deterministically)")
        if d.sampling_temp < 0.0:
            raise ValueError(
                f"sampling_temp must be >= 0, got {d.sampling_temp}")
        if (d.sampling_topk or d.sampling_topp) and d.sampling_temp == 0.0:
            raise ValueError(
                "-sampling_topk/-sampling_topp imply sampling; set "
                "-sampling_temp > 0 (1.0 = untempered)")
        if d.sampling_temp > 0.0:
            # sampling replaces the search: one hypothesis per sentence,
            # and the attn/trace machinery lives in the beam only
            bad = [flag for flag, on in (
                ("beam_size must be 1", d.beam_size != 1),
                ("n_best must be 1", d.n_best != 1),
                ("replace_unk unsupported", d.replace_unk),
                ("dump_beam unsupported", d.dump_beam),
                ("coverage_beta unsupported", d.coverage_beta != 0.0),
                ("block_ngram_repeat unsupported", d.block_ngram_repeat > 0),
            ) if on]
            if bad:
                raise ValueError(
                    "sampling decode (-sampling_temp > 0): " + "; ".join(bad))
        if d.block_ngram_repeat < 0:
            raise ValueError(
                f"block_ngram_repeat must be >= 0, got {d.block_ngram_repeat}")
        if d.ignore_when_blocking and d.block_ngram_repeat == 0:
            # a silently inert flag would let a user believe blocking is on
            raise ValueError(
                "-ignore_when_blocking requires -block_ngram_repeat > 0")
        # token strings -> target-vocab ids (absent tokens map to UNK, the
        # legacy stoi behavior — exempting UNK-grams is the safe reading)
        self._exclusion_ids = tuple(sorted({
            tgt_vocab.stoi.get(t, UNK) for t in d.ignore_when_blocking.split()
        })) if d.ignore_when_blocking else ()
        self._needs_rng = d.latent_from == "sample" or d.sampling_temp > 0.0
        if self.dcfg.n_best > self.dcfg.beam_size:
            # silently clamping would change the n-best block size a
            # downstream output-file parser was promised
            raise ValueError(
                f"n_best ({self.dcfg.n_best}) cannot exceed beam_size "
                f"({self.dcfg.beam_size}): the beam tracks beam_size "
                "hypotheses")
        self.buckets = list(buckets)
        if isinstance(params, tuple):
            params = tuple(
                cast_params_for_inference(p, self.dcfg.infer_dtype)
                for p in params)
        else:
            params = cast_params_for_inference(params, self.dcfg.infer_dtype)
        self.mesh = mesh if (mesh is not None and mesh.size > 1) else None
        if self.mesh is not None:
            from variational_mmt_tpu.parallel.mesh import (
                batch_sharding,
                replicated_sharding,
            )
            from variational_mmt_tpu.parallel.tp import (
                MODEL_AXIS, tree_shardings,
            )

            # on a 2-D (data, model) mesh only the data axis slices the batch
            n_data = dict(zip(self.mesh.axis_names,
                              self.mesh.devices.shape)).get(
                                  "data", self.mesh.size)
            if self.dcfg.batch_size % n_data:
                raise ValueError(
                    f"decode batch_size {self.dcfg.batch_size} must divide by "
                    f"the data-parallel degree {n_data}"
                )
            self._batch_sh = batch_sharding(self.mesh)
            self._repl_sh = replicated_sharding(self.mesh)
            if MODEL_AXIS in self.mesh.axis_names:
                # tensor-parallel decode: vocab-sharded embeddings+generator;
                # the beam's (K·V) top-k rides GSPMD collectives over V
                if len(self.models) > 1:
                    raise ValueError(
                        "ensemble decode does not compose with tensor "
                        "parallelism; use a data-only mesh")
                # int8/scale pairs shard through the same rules: the pair
                # lives UNDER the original leaf path, and parallel/tp.py's
                # spec_for gives int8 the original tensor's spec and scale
                # its last-axis component (tests/test_tp.py int8 decode)
                params = jax.device_put(params, tree_shardings(params, self.mesh))
            elif isinstance(params, tuple):
                params = tuple(
                    jax.device_put(p, replicated_sharding(self.mesh))
                    for p in params)
            else:
                params = jax.device_put(params, replicated_sharding(self.mesh))
        self.params = params
        # optional src->tgt map consulted by replace_unk before copying the
        # source token verbatim (reference -phrase_table)
        self.phrase_table: dict = {}
        self._fn = jax.jit(make_translate_fn(self.models, self.dcfg,
                                             self._exclusion_ids))
        # raw search trees by corpus index, populated when dcfg.dump_beam
        # (the reference's -dump_beam); see ops/beam.py return_trace
        self.beam_traces: dict = {}

    def dispatch_ids(
        self, src_ids: List[List[int]], img_feats: Optional[np.ndarray] = None,
        seed: Optional[int] = None,
        stream_ids: Optional[Sequence[int]] = None,
    ) -> "PendingTranslation":
        """Enqueue the device work for a corpus WITHOUT waiting for it.

        ``seed`` overrides ``dcfg.decode_seed`` for this call only (sampling
        / latent-sampling paths; ignored by deterministic decodes). The seed
        is a runtime input to the compiled program, so varying it — e.g. MBR
        drawing N samples of the corpus — does NOT recompile.

        ``stream_ids`` (optional, one int per sentence) replaces the corpus
        position as the per-sentence PRNG stream key: sentence i draws from
        the (seed, stream_ids[i]) stream instead of (seed, i). This is the
        serving path's reproducibility hook — a sampled answer keyed by a
        caller-chosen id is invariant to how the dynamic batcher happened to
        group the request. Like ``seed``, it is a runtime input (the same
        compiled program serves every assignment) and is ignored by
        deterministic decodes.

        JAX dispatch is asynchronous: every ``self._fn`` call below returns
        device futures immediately, so a caller (e.g. the serving worker)
        can overlap the host-side postprocessing of one group with the
        device compute of the next — pass the returned handle to
        :meth:`finalize_ids` to block and build results.

        Not pipeline-safe with ``dump_beam`` (the trace dict is keyed by
        per-call corpus indices on ``self``); offline callers that dump
        beams go through :meth:`translate_ids`, which is dispatch+finalize
        back-to-back."""
        return PendingTranslation(
            list(self._dispatch_iter(src_ids, img_feats, seed, stream_ids)),
            len(src_ids))

    def _dispatch_iter(self, src_ids, img_feats, seed=None, stream_ids=None):
        """Yield (host Batch, device output) pairs, dispatching lazily —
        each ``self._fn`` call returns device futures immediately, so how
        far the consumer iterates bounds how many batches are in flight."""
        if self.dcfg.dump_beam:
            # corpus indices key this dict: stale entries from a previous
            # corpus must not leak into this call's dump
            self.beam_traces = {}
        streams = None
        if stream_ids is not None:
            if len(stream_ids) != len(src_ids):
                raise ValueError(
                    f"stream_ids must have one entry per sentence: got "
                    f"{len(stream_ids)} for {len(src_ids)} sentences")
            streams = np.asarray(stream_ids, np.int32)
        ds = BinarizedDataset([np.asarray(s, np.int32) for s in src_ids], None)
        # catch-all bucket: a source longer than the largest bucket must be
        # encoded in full, not silently truncated at batch assembly
        buckets = buckets_with_catchall(
            self.buckets, max([1] + [len(s) for s in src_ids]))
        it = BucketIterator(
            ds, batch_size=self.dcfg.batch_size, buckets=buckets,
            img_feats=img_feats, shuffle=False,
        )
        for batch in it.epoch(0):
            img = jnp.asarray(batch.img) if batch.img is not None else None
            src = jnp.asarray(batch.src)
            if self.mesh is not None:
                src = jax.device_put(src, self._batch_sh)
                if img is not None:
                    img = jax.device_put(img, self._batch_sh)
            if self._needs_rng:
                # corpus indices seed the per-sentence PRNG streams (padded
                # rows reuse index 0; their output is masked out anyway);
                # batch.indices stays positional for result placement — only
                # the DEVICE stream key is remapped by stream_ids
                idx_host = np.asarray(batch.indices)
                if streams is not None:
                    idx_host = streams[idx_host]
                idx = jnp.asarray(idx_host, jnp.int32)
                key = jax.random.PRNGKey(
                    self.dcfg.decode_seed if seed is None else seed)
                if self.mesh is not None:
                    idx = jax.device_put(idx, self._batch_sh)
                    key = jax.device_put(key, self._repl_sh)
                yield batch, self._fn(self.params, src, img, idx, key)
            else:
                yield batch, self._fn(self.params, src, img)

    def finalize_ids(
        self, pending: "PendingTranslation"
    ) -> List[List[Tuple[float, List[int]]]]:
        """Block on a :meth:`dispatch_ids` handle and build per-sentence
        n-best lists [(score, token_ids)] in original corpus order. With
        ``replace_unk``, entries are (score, token_ids, attn_positions)."""
        results: dict = {}
        for batch, out in pending.batches:
            self._finalize_batch(batch, out, results)
        return [results[i] for i in range(pending.n)]

    def _finalize_batch(self, batch, out, results: dict) -> None:
        """Host-side postprocessing of one dispatched batch: blocks on its
        device arrays and writes per-sentence n-best lists into ``results``
        keyed by corpus index."""
        n_best = self.dcfg.n_best  # <= beam_size, validated in __init__
        tokens = np.asarray(out[0])
        scores = np.asarray(out[1])
        # variable arity: [tokens, scores, attn?, trace?] — the trace
        # dict is always last when dump_beam is on
        trace = None
        if self.dcfg.dump_beam:
            # ONE device->host transfer per array, then slice on host
            # (per-row device slicing would add ~3 dispatches/sentence)
            trace = {k: np.asarray(v) for k, v in out[-1].items()}
        has_attn = len(out) == (4 if self.dcfg.dump_beam else 3)
        attn = np.asarray(out[2]) if has_attn else None
        for row in range(batch.batch_size):
            if batch.example_mask[row] == 0:
                continue
            i = int(batch.indices[row])
            if trace is not None:
                n = int(trace["n_steps"])
                self.beam_traces[i] = {
                    "parents": trace["parents"][row, :, :n].tolist(),
                    "tokens": trace["tokens"][row, :, :n].tolist(),
                    "scores": trace["scores"][row, :, :n].tolist(),
                    "order": trace["order"][row].tolist(),
                }
            nbest = []
            for k in range(n_best):
                ids = _strip(tokens[row, k])
                if attn is not None:
                    nbest.append((float(scores[row, k]), ids, attn[row, k, : len(ids)].tolist()))
                else:
                    nbest.append((float(scores[row, k]), ids))
            results[i] = nbest

    # offline corpus path: how many dispatched batches may be in flight at
    # once. 2+ overlaps this batch's host postprocessing with the next
    # batch's device compute; the bound keeps every in-flight batch's
    # device OUTPUT buffers (tokens/scores and, with replace_unk or
    # dump_attn, (B,K,L,S) attention) from accumulating corpus-wide —
    # a 29k-sentence corpus at batch 64 is ~450 batches, which unbounded
    # dispatch would hold on the chip simultaneously.
    MAX_INFLIGHT_BATCHES = 4

    def translate_ids(
        self, src_ids: List[List[int]], img_feats: Optional[np.ndarray] = None,
        seed: Optional[int] = None,
        stream_ids: Optional[Sequence[int]] = None,
    ) -> List[List[Tuple[float, List[int]]]]:
        """Returns, per input sentence, the n-best list [(score, token_ids)].
        With ``replace_unk``, entries are (score, token_ids, attn_positions).
        ``seed`` overrides ``dcfg.decode_seed`` for this call and
        ``stream_ids`` replaces corpus positions as the per-sentence PRNG
        stream keys (see :meth:`dispatch_ids`).

        Pipelined: dispatches up to MAX_INFLIGHT_BATCHES ahead of the batch
        being postprocessed on the host, so device compute and host result-
        building overlap without holding the whole corpus's outputs in HBM."""
        results: dict = {}
        window: deque = deque()
        for pair in self._dispatch_iter(src_ids, img_feats, seed, stream_ids):
            window.append(pair)
            if len(window) >= self.MAX_INFLIGHT_BATCHES:
                self._finalize_batch(*window.popleft(), results)
        while window:
            self._finalize_batch(*window.popleft(), results)
        return [results[i] for i in range(len(src_ids))]

    def nbest_to_text(
        self,
        nbest: List[tuple],
        src_tokens: Optional[List[str]] = None,
        debpe: bool = True,
        keep_ids: bool = False,
    ) -> List[tuple]:
        """One sentence's n-best [(score, ids[, attn])] -> [(score, text)]
        (the reference TranslationBuilder's per-sentence role: vocab decode,
        ``replace_unk`` via max-attention source token + phrase table,
        BPE removal). Factored out so serving postprocessing can run it per
        request off the device-owning worker thread."""
        pt = self.phrase_table
        sent = []
        for entry in nbest:
            score, ids = entry[0], entry[1]
            if len(entry) == 3 and src_tokens is not None:
                # replace_unk: the max-attention source token, looked up
                # in the phrase table first when one is loaded (the
                # reference Translator's -phrase_table behavior)
                toks = self.tgt_vocab.decode(ids, strip_special=False)
                toks = [
                    pt.get(s := src_tokens[min(entry[2][j], len(src_tokens) - 1)], s)
                    if t == UNK_TOK and src_tokens else t
                    for j, t in enumerate(toks)
                ]
                text = " ".join(remove_bpe(toks) if debpe else toks)
            else:
                # the shared detok definition (also used by the jax-free MP
                # dispatchers' id-level wire — serve/frontend.py)
                text = self.tgt_vocab.ids_to_text(ids, debpe)
            sent.append((score, text, ids) if keep_ids else (score, text))
        return sent

    def translate_tokens(
        self,
        src_tokens: List[List[str]],
        img_feats: Optional[np.ndarray] = None,
        debpe: bool = True,
        keep_ids: bool = False,
        src_ids: Optional[List[List[int]]] = None,
    ) -> List[List[Tuple[float, str]]]:
        """``keep_ids``: entries become (score, text, raw_token_ids) — the
        undecodable BPE-level ids, needed e.g. to force-decode a hypothesis
        for attention dumps. ``src_ids``: pre-encoded ids for ``src_tokens``
        (a caller that needs the ids anyway — e.g. for scoring — passes them
        to skip a second full-corpus vocab encode)."""
        if src_ids is None:
            src_ids = [self.src_vocab.encode(t) for t in src_tokens]
        return [
            self.nbest_to_text(nbest, src_tokens[sent_i], debpe=debpe,
                               keep_ids=keep_ids)
            for sent_i, nbest in enumerate(self.translate_ids(src_ids, img_feats))
        ]


class PendingTranslation:
    """In-flight device work from :meth:`Translator.dispatch_ids`: the
    per-batch (host Batch metadata, device output arrays) pairs plus the
    corpus size. Opaque to callers; pass to :meth:`Translator.finalize_ids`."""

    __slots__ = ("batches", "n")

    def __init__(self, batches: List[tuple], n: int):
        self.batches = batches
        self.n = n

    def ready(self) -> bool:
        """True once the device work has completed (non-blocking probe).
        A single device (or GSPMD program group) executes dispatches in
        order, so the LAST dispatched batch's scores array is the
        representative leaf; used by the serving worker to size the next
        dynamic batch to the in-flight compute window.

        Never raises: the probe is a runtime RPC on remote devices, and a
        transient probe failure must not kill the probing thread (the
        serving worker calls this outside its guarded dispatch/finalize
        paths) — report ready and let the BLOCKING finalize surface any
        real device error through the guarded path."""
        if not self.batches:
            return True
        scores = self.batches[-1][1][1]
        is_ready = getattr(scores, "is_ready", None)
        if is_ready is None:
            return True
        try:
            return bool(is_ready())
        except Exception:  # noqa: BLE001 — see docstring
            return True


def _strip(ids: np.ndarray) -> List[int]:
    """Cut at EOS, drop PAD."""
    from variational_mmt_tpu.data.vocab import EOS, PAD

    out = []
    for i in ids.tolist():
        if i == EOS:
            break
        if i != PAD:
            out.append(i)
    return out
