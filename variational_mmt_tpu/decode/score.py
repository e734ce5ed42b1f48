"""Force-decoding scorer: teacher-forced log p(y | x, z = prior mean) per
sentence, the decode-time model (latent-mean substitution, deterministic).

Serves two reference behaviors (SURVEY.md §2.1 #15):
- translate's GOLD SCORE / GOLD PPL report when ``-tgt`` is given
  (upstream ``Translator`` force-decodes the reference to score it), and
- ``-attn_debug``-style attention dumps: force-decoding a *predicted*
  hypothesis reproduces exactly the attention the deterministic beam saw,
  without carrying an (L, S) buffer through the on-device search.

TPU shape: one jitted function per bucket shape; per-sentence sums reduce
on device, only (B,) scalars (plus optional (B, T, S) attention) come back.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from variational_mmt_tpu.data.dataset import (BucketIterator, binarize,
                                               buckets_with_catchall)
from variational_mmt_tpu.data.vocab import PAD
from variational_mmt_tpu.models.model import VMMTModel


def make_score_fn(model: VMMTModel, return_attn: bool = False) -> Callable:
    """fn(params, src, tgt_in, tgt_out, img) -> (logp_sum (B,), n_tok (B,)
    [, attn (B, T, S)])."""

    def fn(params, src, tgt_in, tgt_out, img):
        def m_apply(method, *args):
            return model.apply({"params": params}, *args, method=method)

        memory, finals, src_mask, summary = m_apply(VMMTModel.encode, src)
        z = None
        if model.is_latent:
            z = m_apply(VMMTModel.prior_latent, summary, img)
        init_hs = m_apply(VMMTModel.init_decoder_state, finals, z)
        logits, aligns = model.apply(
            {"params": params}, tgt_in, memory, src_mask, init_hs, z, True,
            method=VMMTModel.decode_train,
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tok_mask = (tgt_out != PAD).astype(jnp.float32)
        ll = (jnp.take_along_axis(logp, tgt_out[..., None], axis=-1)[..., 0]
              * tok_mask).sum(axis=-1)
        out = (ll, tok_mask.sum(axis=-1))
        if return_attn:
            out = out + (aligns.astype(jnp.float32),)
        return out

    return fn


def score_corpus(
    model: VMMTModel,
    params,
    src_ids: Sequence[Sequence[int]],
    tgt_ids: Sequence[Sequence[int]],
    img_feats: Optional[np.ndarray] = None,
    buckets: Sequence[int] = (16, 24, 32, 48, 64),
    batch_size: int = 32,
    return_attn: bool = False,
) -> Tuple[np.ndarray, np.ndarray, Optional[List[np.ndarray]]]:
    """Returns (logp (N,), n_tokens (N,), attn or None) in corpus order.
    ``attn[i]`` is (len(tgt_i)+1, len(src_i)) — EOS row included, trimmed to
    the real lengths."""
    ds = binarize(src_ids, tgt_ids)
    # hypotheses/references may exceed the training buckets (e.g. decode
    # max_length 100 vs largest bucket 64): add a catch-all bucket
    buckets = buckets_with_catchall(
        buckets,
        max([1] + [len(s) for s in src_ids] + [len(t) + 1 for t in tgt_ids]))
    it = BucketIterator(ds, batch_size=batch_size, buckets=buckets,
                        img_feats=img_feats, shuffle=False)
    fn = jax.jit(make_score_fn(model, return_attn=return_attn))
    n = len(src_ids)
    logp = np.zeros(n, np.float64)
    ntok = np.zeros(n, np.int64)
    attns: Optional[List[Optional[np.ndarray]]] = [None] * n if return_attn else None
    for batch in it.epoch(0):
        img = jnp.asarray(batch.img) if batch.img is not None else None
        out = fn(params, jnp.asarray(batch.src), jnp.asarray(batch.tgt_in),
                 jnp.asarray(batch.tgt_out), img)
        ll = np.asarray(out[0])
        nt = np.asarray(out[1])
        al = np.asarray(out[2]) if return_attn else None
        for row in range(batch.batch_size):
            if batch.example_mask[row] == 0:
                continue
            i = int(batch.indices[row])
            logp[i] = float(ll[row])
            ntok[i] = int(nt[row])
            if attns is not None:
                t_len = len(tgt_ids[i]) + 1  # + EOS step
                s_len = len(src_ids[i])
                attns[i] = al[row, :t_len, :s_len].copy()
    return logp, ntok, attns


def report_score(name: str, logp: np.ndarray, ntok: np.ndarray) -> str:
    """The reference's ``_report_score`` line: per-WORD avg score + ppl
    (upstream divides score_total by words_total, not by sentence count)."""
    total_lp = float(logp.sum())
    total_tok = max(int(ntok.sum()), 1)
    per_word = total_lp / total_tok
    return f"{name} AVG SCORE: {per_word:.4f}, {name} PPL: {float(np.exp(-per_word)):.4f}"
