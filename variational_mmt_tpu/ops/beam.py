"""Fully on-device batched beam search.

The reference's ``onmt.translate.Beam`` advances one token at a time in a
Python loop, reordering GPU tensors through host-side backpointer lists
(SURVEY.md §3.3 — the decode throughput bottleneck). Here the entire search
is ONE compiled XLA program: a ``lax.while_loop`` whose state is a pytree of
fixed-shape arrays, vectorized over (batch x beam):

- hypotheses flattened to (B*K, ...) for the decoder step (one big GEMM
  instead of K small ones — MXU-friendly);
- top-k over the joint (K*V) continuation scores per sentence;
- EOS is absorbing: finished hypotheses may only extend with PAD at
  log-prob 0, freezing their score (no separate finished-set bookkeeping);
- GNMT length penalty ((5+len)/6)^alpha applied at finalization, matching
  the reference's GNMTGlobalScorer semantics (search ranks by raw
  cumulative log-prob; final n-best ranks by penalized score);
- early exit when every beam in every sentence has finished.

Batched-beam vectorization pattern follows the public literature retrieved
in PAPERS.md (e.g. arXiv:1811.04568) rather than the reference's host-side
implementation.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from variational_mmt_tpu.data.vocab import BOS, EOS, PAD

NEG_INF = -1.0e9

# step_fn: (carry, tokens (N,)) -> (carry, log_probs (N, V))
StepFn = Callable[[Any, jax.Array], Tuple[Any, jax.Array]]


class BeamState(NamedTuple):
    t: jax.Array  # scalar int32
    tokens: jax.Array  # (B, K, L) emitted tokens (BOS not stored)
    scores: jax.Array  # (B, K) cumulative raw log-prob
    finished: jax.Array  # (B, K) bool
    lengths: jax.Array  # (B, K) int32 tokens emitted incl. EOS
    carry: Any  # decoder carry, leaves (B*K, ...)
    last_tok: jax.Array  # (B, K)
    attn_src: jax.Array  # (B, K, L) argmax source position per emitted token
    coverage: jax.Array  # (B, K, S) summed attention mass per source position
    # ((B, K, 1) zeros when the coverage penalty is off)
    trace_pt: jax.Array  # (B, K, L, 2) raw per-step (parent, token) — the
    # search tree for -dump_beam ((B, K, 1, 2) zeros when tracing is off)
    trace_sc: jax.Array  # (B, K, L) raw per-step cumulative scores


def length_penalty(lengths: jax.Array, alpha: float, kind: str = "gnmt") -> jax.Array:
    lengths = lengths.astype(jnp.float32)
    if kind == "gnmt":
        return ((5.0 + lengths) / 6.0) ** alpha
    if kind == "average":
        return jnp.maximum(lengths, 1.0)
    if kind != "none":
        # a typo'd kind silently disabling the penalty would shift n-best
        # ranking with no error
        raise ValueError(f"unknown length_penalty kind: {kind!r} "
                         "(expected gnmt | average | none)")
    return jnp.ones_like(lengths)


def _gather_beams(tree: Any, parents: jax.Array, B: int, K: int) -> Any:
    """Reorder carry leaves (B*K, ...) by per-sentence parent indices (B,K)."""

    def one(x):
        xk = x.reshape((B, K) + x.shape[1:])
        return jnp.take_along_axis(
            xk, parents.reshape((B, K) + (1,) * (x.ndim - 1)), axis=1
        ).reshape((B * K,) + x.shape[1:])

    return jax.tree.map(one, tree)


def beam_search(
    step_fn: StepFn,
    init_carry: Any,  # leaves (B, ...); will be tiled to (B*K, ...)
    batch_size: int,
    beam_size: int,
    max_length: int,
    min_length: int = 0,
    alpha: float = 0.6,
    penalty: str = "gnmt",
    eos_id: int = EOS,
    bos_id: int = BOS,
    pad_id: int = PAD,
    return_attn: bool = False,
    coverage_beta: float = 0.0,
    src_mask: Any = None,
    return_trace: bool = False,
    block_ngram_repeat: int = 0,
    exclusion_tokens: Tuple[int, ...] = (),
):
    """Returns (tokens (B, K, max_length) sorted best-first, penalized scores
    (B, K)) — plus attention-argmax source positions (B, K, max_length) when
    ``return_attn`` (for the reference's -replace_unk). ``step_fn`` consumes
    flattened (B*K,) token ids and returns (carry, log_probs) or
    (carry, log_probs, attn) where attn is either per-beam argmax source
    positions (N,) or full attention probs (N, S) — the full probs are
    required when ``coverage_beta != 0``.

    ``coverage_beta``: GNMT coverage penalty (Wu et al. 2016, the
    reference's Penalties.py coverage_wu): the finalized score adds
    beta * sum_s log(min(coverage_s, 1)) over real source positions
    (``src_mask`` (B, S), required when beta != 0), rewarding hypotheses
    whose attention covers the whole source.

    ``block_ngram_repeat`` (the reference lineage's flag of the same name):
    g > 0 prevents any hypothesis from CONTAINING a repeated g-gram — at
    each step, a candidate token that would complete a g-gram already
    present in its parent hypothesis is masked to NEG_INF before top-k.
    (The legacy implementation instead killed a hypothesis after the repeat
    appeared; masking-before-selection is the prevention form — same
    guarantee on the output, no wasted beam slots.) g == 1 forbids
    repeating any token at all. ``exclusion_tokens``: g-grams containing
    any of these token ids are never blocked (the reference's
    -ignore_when_blocking, for subword/punctuation tokens that legally
    repeat). The masking is O(L) shifted-window comparisons per step — all
    static shapes, no host round-trips.

    ``return_trace`` (the reference's -dump_beam): additionally returns the
    RAW search tree — per step t and new-beam slot k, the parent beam slot,
    chosen token, and cumulative raw score, all recorded BEFORE any
    reordering — plus the final best-first slot order, as a dict
    {parents, tokens, scores (B, K, L), order (B, K)}. Following parents
    backwards from any final slot reconstructs that hypothesis exactly."""
    B, K, L = batch_size, beam_size, max_length
    use_cov = coverage_beta != 0.0
    if use_cov and src_mask is None:
        raise ValueError("coverage_beta != 0 requires src_mask (B, S)")
    S = src_mask.shape[1] if use_cov else 1

    carry0 = jax.tree.map(lambda x: jnp.repeat(x, K, axis=0), init_carry)
    state = BeamState(
        t=jnp.int32(0),
        tokens=jnp.full((B, K, L), pad_id, jnp.int32),
        # only beam 0 live at t=0: all K beams start identical
        scores=jnp.tile(jnp.array([0.0] + [NEG_INF] * (K - 1), jnp.float32), (B, 1)),
        finished=jnp.zeros((B, K), bool),
        lengths=jnp.zeros((B, K), jnp.int32),
        carry=carry0,
        last_tok=jnp.full((B, K), bos_id, jnp.int32),
        attn_src=jnp.zeros((B, K, L), jnp.int32),
        coverage=jnp.zeros((B, K, S), jnp.float32),
        trace_pt=jnp.zeros((B, K, L if return_trace else 1, 2), jnp.int32),
        trace_sc=jnp.zeros((B, K, L if return_trace else 1), jnp.float32),
    )

    def cond(s: BeamState):
        return (s.t < L) & ~jnp.all(s.finished)

    def body(s: BeamState) -> BeamState:
        out = step_fn(s.carry, s.last_tok.reshape(B * K))
        attn_probs = None
        if len(out) == 3:
            carry, logp, attn = out
            if attn.ndim == 2:  # full attention probs (N, S)
                attn_probs = attn.reshape(B, K, -1).astype(jnp.float32)
                attn_arg = jnp.argmax(attn_probs, axis=-1).astype(jnp.int32)
            else:
                attn_arg = attn.reshape(B, K)
        else:
            carry, logp = out
            if return_attn:
                # without this the search would silently record argmax 0
                # for every step and replace_unk would copy src position 0
                raise ValueError(
                    "return_attn=True requires step_fn to return attention "
                    "(argmax positions (N,) or full probs (N, S)) as its "
                    "third output"
                )
            attn_arg = jnp.zeros((B, K), jnp.int32)
        if use_cov and attn_probs is None:
            raise ValueError(
                "coverage_beta != 0 requires step_fn to return full attention "
                "probs (N, S) as its third output"
            )
        V = logp.shape[-1]
        logp = logp.reshape(B, K, V).astype(jnp.float32)
        # PAD is never a legal continuation of a LIVE hypothesis (it is
        # re-allowed below as the absorbing extension of finished beams):
        # a model-selected mid-hypothesis PAD would be dropped by the
        # output strip while its log-prob stayed in the score and its
        # attention step desynced the replace_unk positions
        logp = jnp.where(jnp.arange(V)[None, None, :] == pad_id, NEG_INF, logp)
        # min-length: no EOS before min_length tokens emitted
        logp = jnp.where(
            (s.t < min_length) & (jnp.arange(V)[None, None, :] == eos_id), NEG_INF, logp
        )
        if block_ngram_repeat > 0 and block_ngram_repeat <= L:
            # (g > L can never fire — a repeated g-gram needs 2g <= L+1
            # positions; skipping it statically also keeps the shifted
            # windows below well-formed)
            # mask tokens that would complete a repeated g-gram (docstring).
            # Live histories contain only real emitted tokens at positions
            # < t (PAD/EOS can't appear mid-hypothesis), and finished rows
            # are overridden by the absorbing-EOS rule just below, so a
            # PAD-run in a finished row's tail can never block its PAD
            # extension.
            g = block_ngram_repeat
            hist = s.tokens  # (B, K, L)
            # static shifted windows: win[i][..., p] == hist[..., p+i]
            win = [
                jnp.concatenate(
                    [hist[:, :, i:], jnp.full((B, K, i), pad_id, jnp.int32)],
                    axis=2) if i else hist
                for i in range(g)
            ]
            # the candidate g-gram's context: the last g-1 emitted tokens
            # (positions t-g+1 .. t-1; clip is safe — `valid` is empty then)
            match = jnp.ones((B, K, L), bool)
            if g > 1:
                pos = jnp.clip(s.t - (g - 1) + jnp.arange(g - 1), 0, L - 1)
                ctx = jnp.take(hist, pos, axis=2)  # (B, K, g-1)
                for i in range(g - 1):
                    match &= win[i] == ctx[:, :, i][..., None]
            # an earlier g-gram exists at p iff p+g-1 <= t-1
            pen_mask = match & (jnp.arange(L)[None, None, :] <= s.t - g)
            if exclusion_tokens:
                excl = jnp.zeros((B, K, L), bool)
                for e in exclusion_tokens:
                    for i in range(g):
                        excl |= win[i] == e
                pen_mask &= ~excl
            blocked_tok = win[g - 1]  # (B, K, L): the earlier g-gram's tail
            bi = jnp.arange(B)[:, None, None]
            ki = jnp.arange(K)[None, :, None]
            logp = logp.at[bi, ki, blocked_tok].add(
                jnp.where(pen_mask, NEG_INF, 0.0))
        # absorbing EOS: finished beams extend only with PAD at logp 0
        fin = s.finished[..., None]
        pad_row = jnp.where(jnp.arange(V)[None, None, :] == pad_id, 0.0, NEG_INF)
        logp = jnp.where(fin, pad_row, logp)

        cand = s.scores[..., None] + logp  # (B, K, V)
        flat = cand.reshape(B, K * V)
        new_scores, idx = jax.lax.top_k(flat, K)  # (B, K)
        parents = idx // V
        toks = idx % V

        # reorder everything by parent beam
        tokens = jnp.take_along_axis(s.tokens, parents[..., None], axis=1)
        tokens = jax.lax.dynamic_update_slice_in_dim(
            tokens, toks[..., None], s.t, axis=2
        )
        attn_src = jnp.take_along_axis(s.attn_src, parents[..., None], axis=1)
        attn_src = jax.lax.dynamic_update_slice_in_dim(
            attn_src, jnp.take_along_axis(attn_arg, parents, axis=1)[..., None], s.t, axis=2
        )
        was_finished = jnp.take_along_axis(s.finished, parents, axis=1)
        lengths = jnp.take_along_axis(s.lengths, parents, axis=1)
        lengths = jnp.where(was_finished, lengths, lengths + 1)
        finished = was_finished | (toks == eos_id)
        carry = _gather_beams(carry, parents, B, K)
        coverage = s.coverage
        if use_cov:
            coverage = jnp.take_along_axis(s.coverage, parents[..., None], axis=1)
            step_attn = jnp.take_along_axis(
                attn_probs, parents[..., None], axis=1
            )
            # finished beams stop accumulating (their PAD steps attend nowhere)
            coverage = coverage + step_attn * (~was_finished)[..., None]
        trace_pt, trace_sc = s.trace_pt, s.trace_sc
        if return_trace:
            # RAW tree entries for this step (slot-indexed, never reordered)
            trace_pt = jax.lax.dynamic_update_slice_in_dim(
                trace_pt, jnp.stack([parents, toks], axis=-1)[:, :, None, :], s.t, axis=2
            )
            trace_sc = jax.lax.dynamic_update_slice_in_dim(
                trace_sc, new_scores[..., None], s.t, axis=2
            )
        return BeamState(
            t=s.t + 1,
            tokens=tokens,
            scores=new_scores,
            finished=finished,
            lengths=lengths,
            carry=carry,
            last_tok=toks,
            attn_src=attn_src,
            coverage=coverage,
            trace_pt=trace_pt,
            trace_sc=trace_sc,
        )

    final = jax.lax.while_loop(cond, body, state)

    # unfinished beams count as length max_length (no EOS)
    lengths = jnp.where(final.finished, final.lengths, L)
    scored = final.scores / length_penalty(jnp.maximum(lengths, 1), alpha, penalty)
    if use_cov:
        cov = jnp.clip(jnp.minimum(final.coverage, 1.0), 1e-10, None)
        cp = (jnp.log(cov) * src_mask[:, None, :].astype(jnp.float32)).sum(-1)
        scored = scored + coverage_beta * cp
    order = jnp.argsort(-scored, axis=1)
    tokens = jnp.take_along_axis(final.tokens, order[..., None], axis=1)
    scored = jnp.take_along_axis(scored, order, axis=1)
    outs = [tokens, scored]
    if return_attn:
        outs.append(jnp.take_along_axis(final.attn_src, order[..., None], axis=1))
    if return_trace:
        outs.append({
            "parents": final.trace_pt[..., 0],
            "tokens": final.trace_pt[..., 1],
            "scores": final.trace_sc,
            "order": order,
            "n_steps": final.t,
        })
    return tuple(outs)


def greedy_search(
    step_fn: StepFn,
    init_carry: Any,
    batch_size: int,
    max_length: int,
    eos_id: int = EOS,
    bos_id: int = BOS,
    pad_id: int = PAD,
) -> Tuple[jax.Array, jax.Array]:
    """Argmax decoding in one ``lax.while_loop``; returns
    (tokens (B, max_length), scores (B,) cumulative log-prob of the emitted
    tokens — real hypothesis scores, matching what the K=1 beam would
    accumulate, so greedy-path callers never hand out fake zeros)."""
    B, L = batch_size, max_length

    def cond(s):
        t, _, finished, _, _, _ = s
        return (t < L) & ~jnp.all(finished)

    def body(s):
        t, tokens, finished, carry, last, score = s
        carry, logp = step_fn(carry, last)
        # same PAD exclusion as the beam: live rows must not emit PAD
        logp = jnp.where(jnp.arange(logp.shape[-1])[None, :] == pad_id,
                         NEG_INF, logp)
        tok = jnp.argmax(logp, axis=-1).astype(jnp.int32)
        step_lp = jnp.take_along_axis(logp, tok[:, None], axis=-1)[:, 0]
        score = jnp.where(finished, score, score + step_lp)
        tok = jnp.where(finished, pad_id, tok)
        tokens = jax.lax.dynamic_update_slice_in_dim(tokens, tok[:, None], t, axis=1)
        finished = finished | (tok == eos_id)
        return (t + 1, tokens, finished, carry, tok, score)

    init = (
        jnp.int32(0),
        jnp.full((B, L), pad_id, jnp.int32),
        jnp.zeros((B,), bool),
        init_carry,
        jnp.full((B,), bos_id, jnp.int32),
        jnp.zeros((B,), jnp.float32),
    )
    _, tokens, _, _, _, scores = jax.lax.while_loop(cond, body, init)
    return tokens, scores


def sampling_search(
    step_fn: StepFn,
    init_carry: Any,
    batch_size: int,
    max_length: int,
    row_keys: jax.Array,  # (B,) PRNG keys, one per sentence
    temperature: float = 1.0,
    topk: int = 0,
    topp: float = 0.0,
    min_length: int = 0,
    eos_id: int = EOS,
    bos_id: int = BOS,
    pad_id: int = PAD,
) -> Tuple[jax.Array, jax.Array]:
    """Ancestral sampling in one ``lax.while_loop`` (the reference lineage's
    ``-random_sampling_topk`` family; upstream restricts it to beam 1, as
    does the caller here). At each step the next-token distribution is
    tempered (``log_softmax(logp / temperature)``), optionally truncated to
    the ``topk`` highest-probability tokens and/or the ``topp`` nucleus
    (smallest prefix of the sorted distribution with cumulative probability
    >= topp; ties at the top-k boundary keep all tied tokens), renormalized,
    and sampled.

    PRNG discipline (batch-composition invariance): ``row_keys`` carries ONE
    key per sentence — the caller folds the corpus index into a base seed —
    and the step key is ``fold_in(row_key, t)``, so a sentence's sample path
    is identical no matter which batch or bucket it lands in.

    Returns (tokens (B, max_length), scores (B,)) where scores accumulate
    the RAW (untempered, unfiltered) model log-prob of the sampled tokens —
    the same quantity greedy/beam report, so a sampled hypothesis's score
    equals its force-decode score."""
    B, L = batch_size, max_length
    if temperature <= 0.0:
        raise ValueError(f"sampling temperature must be > 0, got {temperature}")
    if topp < 0.0 or topp > 1.0:
        raise ValueError(f"topp must be in [0, 1], got {topp}")

    def cond(s):
        t, _, finished, _, _, _ = s
        return (t < L) & ~jnp.all(finished)

    def body(s):
        t, tokens, finished, carry, last, score = s
        carry, logp = step_fn(carry, last)
        V = logp.shape[-1]
        # live rows must never emit PAD (same exclusion as greedy/beam)
        logp = jnp.where(jnp.arange(V)[None, :] == pad_id, NEG_INF, logp)
        # min-length: EOS unsampleable before min_length tokens emitted
        filt = jnp.where(
            (t < min_length) & (jnp.arange(V)[None, :] == eos_id), NEG_INF, logp
        )
        if temperature != 1.0:
            # log_softmax(logp/T) == log_softmax(logits/T): the 1/T shared
            # normalizer cancels under the re-normalization
            filt = jax.nn.log_softmax(filt / temperature, axis=-1)
        if topk and topk > 0:
            kth = jax.lax.top_k(filt, min(topk, V))[0][:, -1]
            filt = jnp.where(filt < kth[:, None], NEG_INF, filt)
            filt = jax.nn.log_softmax(filt, axis=-1)  # renormalize for topp
        if topp and topp > 0.0:
            sorted_lp = -jnp.sort(-filt, axis=-1)  # descending
            probs = jnp.exp(sorted_lp)
            cum = jnp.cumsum(probs, axis=-1)
            # keep a position iff the mass strictly before it is < topp
            # (the argmax is always kept: its prefix mass is 0)
            keep = (cum - probs) < topp
            thresh = jnp.min(jnp.where(keep, sorted_lp, jnp.inf), axis=-1)
            filt = jnp.where(filt < thresh[:, None], NEG_INF, filt)
        step_keys = jax.vmap(lambda k: jax.random.fold_in(k, t))(row_keys)
        tok = jax.vmap(jax.random.categorical)(step_keys, filt).astype(jnp.int32)
        # RAW model log-prob of the choice (tok is never PAD on live rows,
        # so the PAD mask above cannot leak into the score)
        step_lp = jnp.take_along_axis(logp, tok[:, None], axis=-1)[:, 0]
        score = jnp.where(finished, score, score + step_lp)
        tok = jnp.where(finished, pad_id, tok)
        tokens = jax.lax.dynamic_update_slice_in_dim(tokens, tok[:, None], t, axis=1)
        finished = finished | (tok == eos_id)
        return (t + 1, tokens, finished, carry, tok, score)

    init = (
        jnp.int32(0),
        jnp.full((B, L), pad_id, jnp.int32),
        jnp.zeros((B,), bool),
        init_carry,
        jnp.full((B,), bos_id, jnp.int32),
        jnp.zeros((B,), jnp.float32),
    )
    _, tokens, _, _, _, scores = jax.lax.while_loop(cond, body, init)
    return tokens, scores
