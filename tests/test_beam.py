"""On-device beam search: validated against a slow host-side reference beam
on a deterministic toy language model (SURVEY.md §7: "validate beam against a
slow host-side Python beam" before trusting BLEU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from variational_mmt_tpu.data.vocab import BOS, EOS, PAD
from variational_mmt_tpu.ops.beam import beam_search, greedy_search, length_penalty


def toy_lm(V=7, seed=0):
    """A fixed Markov LM: log p(next | prev). Carry = last token (unused
    beyond step_fn's own token argument, but exercises carry reordering)."""
    rng = np.random.default_rng(seed)
    table = rng.standard_normal((V, V)).astype(np.float32)
    table = jax.nn.log_softmax(jnp.array(table), axis=-1)

    def step_fn(carry, toks):
        # carry: dict with "prev" (N,), "junk" (N, 3) to test pytree gather
        logp = table[toks]
        new_carry = {"prev": toks, "junk": carry["junk"] + 1.0}
        return new_carry, logp

    return step_fn, np.asarray(table)


def host_beam(table, K, L, alpha, min_length=0):
    """Exhaustive/deterministic reference beam for batch of 1 starting at BOS."""
    beams = [([], 0.0, False)]  # (tokens, score, finished)
    for t in range(L):
        cand = []
        for toks, score, fin in beams:
            if fin:
                cand.append((toks + [PAD], score, True))
                continue
            prev = toks[-1] if toks else BOS
            for v in range(table.shape[1]):
                if v == PAD:
                    continue  # live beams never extend with PAD (device rule)
                lp = table[prev, v]
                if t < min_length and v == EOS:
                    lp = -1e9
                cand.append((toks + [v], score + lp, fin or v == EOS))
        cand.sort(key=lambda x: -x[1])
        beams = cand[:K]
        if all(f for _, _, f in beams):
            break

    def plen(toks):
        n = 0
        for x in toks:
            if x == PAD:
                continue
            n += 1
            if x == EOS:
                break
        return ((5.0 + max(min(n, L), 1)) / 6.0) ** alpha

    scored = sorted(((s / plen(t), t) for t, s, _ in beams), key=lambda x: -x[0])
    return scored


@pytest.mark.parametrize("K", [1, 4])
def test_beam_matches_host_reference(K):
    V, L, alpha = 7, 6, 0.6
    step_fn, table = toy_lm(V)
    init_carry = {"prev": jnp.zeros((1,), jnp.int32), "junk": jnp.zeros((1, 3))}
    tokens, scores = jax.jit(
        lambda c: beam_search(step_fn, c, 1, K, L, alpha=alpha)
    )(init_carry)
    want = host_beam(table, K, L, alpha)
    got_best = [t for t in np.asarray(tokens)[0, 0].tolist() if t != PAD]
    want_best = [t for t in want[0][1] if t != PAD]
    assert got_best == want_best, (got_best, want_best)
    np.testing.assert_allclose(float(scores[0, 0]), want[0][0], rtol=1e-4)


def test_beam_min_length_blocks_eos():
    step_fn, table = toy_lm()
    init_carry = {"prev": jnp.zeros((1,), jnp.int32), "junk": jnp.zeros((1, 3))}
    tokens, _ = beam_search(step_fn, init_carry, 1, 4, 8, min_length=5)
    row = np.asarray(tokens)[0, 0]
    eos_pos = np.where(row == EOS)[0]
    if len(eos_pos):
        assert eos_pos[0] >= 5


def test_beam_batch_independence():
    """Each sentence's beam must be independent of its batchmates."""
    V = 7
    rng = np.random.default_rng(3)
    table = jax.nn.log_softmax(jnp.array(rng.standard_normal((4, V, V)), jnp.float32), -1)

    def step_fn(carry, toks):
        sent = carry["sent"]  # (N,) which sentence each row belongs to
        return carry, table[sent, toks]

    K, L = 3, 5
    # batch of 2 sentences with different tables
    init2 = {"sent": jnp.array([0, 1], jnp.int32)}
    tok2, sc2 = beam_search(step_fn, init2, 2, K, L)
    # singleton runs
    tok_a, sc_a = beam_search(step_fn, {"sent": jnp.array([0], jnp.int32)}, 1, K, L)
    tok_b, sc_b = beam_search(step_fn, {"sent": jnp.array([1], jnp.int32)}, 1, K, L)
    np.testing.assert_array_equal(np.asarray(tok2[0]), np.asarray(tok_a[0]))
    np.testing.assert_array_equal(np.asarray(tok2[1]), np.asarray(tok_b[0]))
    np.testing.assert_allclose(np.asarray(sc2), np.concatenate([sc_a, sc_b]), rtol=1e-5)


def test_greedy_matches_beam1_argmax_path():
    step_fn, table = toy_lm()
    init_carry = {"prev": jnp.zeros((2,), jnp.int32), "junk": jnp.zeros((2, 3))}
    toks, scores = greedy_search(step_fn, init_carry, 2, 6)
    # manual argmax walk (PAD excluded for live rows, matching the device)
    V = table.shape[1]
    t = BOS
    want = []
    for _ in range(6):
        t = int(np.argmax(np.where(np.arange(V) == PAD, -1e9, table[t])))
        want.append(t)
        if t == EOS:
            break
    prev, want_score = BOS, 0.0
    for tok in want:
        want_score += float(table[prev, tok])
        prev = tok
    row = [x for x in np.asarray(toks)[0].tolist() if x != PAD]
    assert row == want
    # scores must be the REAL cumulative log-prob (serve clients receive
    # them; they were previously fake zeros on the greedy fast path)
    np.testing.assert_allclose(float(scores[0]), want_score, rtol=1e-5)


def test_live_rows_never_emit_pad():
    """A (pathological) model that ranks PAD highest must not place PAD in
    a live hypothesis: mid-hypothesis PAD would be dropped by the output
    strip while desyncing attention positions and keeping its log-prob."""
    V = 7
    logits = np.full((V,), -5.0, np.float32)
    logits[PAD] = 5.0  # PAD always wins an unmasked argmax
    logits[4] = 1.0
    table = jax.nn.log_softmax(jnp.array(np.tile(logits, (V, 1))), axis=-1)

    def step_fn(carry, toks):
        return carry, table[toks]

    toks, _ = greedy_search(step_fn, jnp.zeros((1,), jnp.int32), 1, 5)
    emitted = np.asarray(toks)[0].tolist()
    assert 4 in emitted and all(
        x != PAD for x in emitted[: emitted.index(4) + 1])
    bt, _ = beam_search(step_fn, jnp.zeros((1,), jnp.int32), 1, 2, 5)
    for k in range(2):
        row = np.asarray(bt)[0, k].tolist()
        # PAD may appear only as post-EOS padding
        first_pad = row.index(PAD) if PAD in row else len(row)
        assert first_pad == len(row) or EOS in row[:first_pad]


def test_length_penalty_values():
    np.testing.assert_allclose(float(length_penalty(jnp.array(1.0), 0.6)), 1.0)
    lp = float(length_penalty(jnp.array(7.0), 1.0))
    np.testing.assert_allclose(lp, 2.0)
    assert float(length_penalty(jnp.array(50.0), 0.0)) == 1.0


def test_beam_attn_tracking():
    """return_attn carries the per-step attention argmax through beam
    reordering, aligned with the emitted tokens."""
    import jax.numpy as jnp
    step_fn0, table = toy_lm()

    def step_fn(carry, toks):
        step = carry["step"] + 1  # keep "step" across toy_lm's carry rebuild
        inner, logp = step_fn0(carry, toks)
        carry = dict(inner, step=step)
        # deterministic "attention": parent token id * 10 + step count
        return carry, logp, toks * 10 + step

    init = {"prev": jnp.zeros((1,), jnp.int32), "junk": jnp.zeros((1, 3)),
            "step": jnp.zeros((1,), jnp.int32)}
    tokens, scores, attn = beam_search(step_fn, init, 1, 3, 5, return_attn=True)
    tokens, attn = np.asarray(tokens), np.asarray(attn)
    # attention record at step t must equal last_tok(t)*10 + t (+1 offset)
    for k in range(3):
        prev = BOS
        for t in range(5):
            tok = tokens[0, k, t]
            if tok == PAD:
                break
            assert attn[0, k, t] == prev * 10 + (t + 1), (k, t, tokens[0, k], attn[0, k])
            prev = tok


@pytest.mark.parametrize("seed", [1, 2, 3, 4])
def test_beam_fuzz_vs_host_reference(seed):
    """Fuzz: random Markov LMs, K=3, must match the exhaustive host beam."""
    V, K, L, alpha = 9, 3, 7, 0.6
    step_fn, table = toy_lm(V, seed=seed)
    init_carry = {"prev": jnp.zeros((1,), jnp.int32), "junk": jnp.zeros((1, 3))}
    tokens, scores = beam_search(step_fn, init_carry, 1, K, L, alpha=alpha)
    want = host_beam(table, K, L, alpha)
    got_best = [t for t in np.asarray(tokens)[0, 0].tolist() if t != PAD]
    want_best = [t for t in want[0][1] if t != PAD]
    assert got_best == want_best, (seed, got_best, want_best)
    np.testing.assert_allclose(float(scores[0, 0]), want[0][0], rtol=1e-4)


def test_beam_full_attn_probs_argmax_tracking():
    """A 2-D (probs) third output from step_fn: the beam derives the argmax
    internally (the translator now returns full probs for replace_unk)."""
    step_fn0, table = toy_lm()
    S = 4

    def step_fn(carry, toks):
        inner, logp = step_fn0(carry, toks)
        # attention peaked at position (tok mod S)
        probs = jax.nn.one_hot(toks % S, S) * 0.7 + 0.3 / S
        return inner, logp, probs

    init = {"prev": jnp.zeros((1,), jnp.int32), "junk": jnp.zeros((1, 3))}
    tokens, scores, attn = beam_search(step_fn, init, 1, 3, 5, return_attn=True)
    tokens, attn = np.asarray(tokens), np.asarray(attn)
    prev = BOS
    for t in range(5):
        tok = tokens[0, 0, t]
        if tok == PAD:
            break
        assert attn[0, 0, t] == prev % S, (t, tokens[0, 0], attn[0, 0])
        prev = tok


def test_beam_coverage_penalty_golden():
    """coverage_beta: final score == (beta=0 score) + beta * sum_s
    log(min(cov_s, 1)) with uniform per-step attention (K=1 so the raw
    search path is identical)."""
    step_fn0, table = toy_lm()
    S = 4
    src_mask = jnp.ones((1, S), jnp.float32)

    def step_fn(carry, toks):
        inner, logp = step_fn0(carry, toks)
        return inner, logp, jnp.full((toks.shape[0], S), 1.0 / S)

    init = {"prev": jnp.zeros((1,), jnp.int32), "junk": jnp.zeros((1, 3))}
    L = 6
    t0, s0 = beam_search(step_fn, init, 1, 1, L)
    beta = 0.3
    t1, s1 = beam_search(step_fn, init, 1, 1, L, coverage_beta=beta,
                         src_mask=src_mask)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    # length = emitted tokens incl. EOS
    toks = [int(x) for x in np.asarray(t0)[0, 0] if x != PAD]
    n = len(toks)
    cov = min(n / S, 1.0)
    want = float(s0[0, 0]) + beta * S * np.log(cov)
    np.testing.assert_allclose(float(s1[0, 0]), want, rtol=1e-5)


def test_beam_coverage_prefers_covering_hypothesis():
    """Two equal-raw-score continuations; the one whose attention covers the
    source must win once coverage_beta > 0."""
    S = 4
    V = 6
    # logp: tokens 4 and 5 equally likely every step; EOS after 2 steps
    base = np.full((V,), -1e9, np.float32)
    base[4] = base[5] = np.log(0.5)

    def step_fn(carry, toks):
        t = carry["t"]
        logp = jnp.where(
            (t >= 2)[:, None] & (jnp.arange(V)[None, :] == EOS), 0.0,
            jnp.where((t >= 2)[:, None], -1e9, jnp.asarray(base)[None, :]),
        )
        # token 4 always attends position 0; token 5 spreads uniformly
        probs = jnp.where(
            (toks == 4)[:, None], jax.nn.one_hot(jnp.zeros_like(toks), S),
            jnp.full((toks.shape[0], S), 1.0 / S),
        )
        return {"t": t + 1}, logp, probs

    init = {"t": jnp.zeros((4,), jnp.int32)}
    src_mask = jnp.ones((4, S), jnp.float32)
    tokens, scores = beam_search(
        step_fn, init, 4, 4, 4, coverage_beta=0.5, src_mask=src_mask
    )
    top = np.asarray(tokens)[:, 0, :2]
    # the all-5 hypothesis (uniform attention -> best coverage) must rank first
    np.testing.assert_array_equal(top, np.full((4, 2), 5))


def test_beam_trace_reconstructs_hypotheses():
    """-dump_beam tree: following raw (parent, token) entries backwards from
    any final slot must reproduce exactly the hypothesis the beam returned
    for that slot, and the traced scores must match the final raw scores."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from variational_mmt_tpu.data.vocab import EOS, PAD
    from variational_mmt_tpu.ops.beam import beam_search, length_penalty

    B, K, L, V = 3, 4, 9, 12
    rng = np.random.default_rng(11)
    table = jnp.asarray(rng.standard_normal((V, V)).astype(np.float32))

    def step_fn(carry, toks):
        # deterministic toy LM: logits depend on last token + a step counter
        t = carry
        logp = jax.nn.log_softmax(table[toks] + 0.1 * t, axis=-1)
        return t + 1, logp

    out = beam_search(step_fn, jnp.zeros((B,), jnp.float32), B, K, L,
                      alpha=0.0, return_trace=True)
    tokens, scores, trace = np.asarray(out[0]), np.asarray(out[1]), out[2]
    parents = np.asarray(trace["parents"])
    tr_toks = np.asarray(trace["tokens"])
    tr_sc = np.asarray(trace["scores"])
    order = np.asarray(trace["order"])
    n = int(trace["n_steps"])

    for b in range(B):
        for rank in range(K):
            slot = order[b, rank]
            # walk the tree backwards from the final slot
            rebuilt = []
            s = slot
            for t in range(n - 1, -1, -1):
                rebuilt.append(tr_toks[b, s, t])
                s = parents[b, s, t]
            rebuilt = rebuilt[::-1] + [PAD] * (L - n)
            np.testing.assert_array_equal(np.asarray(rebuilt), tokens[b, rank])
            # final traced score (raw) must equal the returned score after
            # undoing the length penalty (alpha=0 -> penalty 1, equal)
            np.testing.assert_allclose(tr_sc[b, slot, n - 1], scores[b, rank],
                                       rtol=1e-5)


def test_return_attn_requires_attn_output():
    """return_attn with a 2-output step_fn must raise (not silently record
    argmax 0 everywhere, which would make replace_unk copy src position 0)."""
    import pytest

    V = 7
    step_fn, _ = toy_lm(V)
    init_carry = {"prev": jnp.zeros((1,), jnp.int32), "junk": jnp.zeros((1, 3))}
    with pytest.raises(ValueError, match="third output"):
        beam_search(step_fn, init_carry, 1, 2, 6, return_attn=True)


# ---------------------------------------------------------------- blocking

def _emitted(row):
    out = []
    for t in np.asarray(row).tolist():
        if t == PAD:
            continue
        out.append(t)
        if t == EOS:
            break
    return out


def _has_repeat(seq, g):
    grams = [tuple(seq[i:i + g]) for i in range(len(seq) - g + 1)]
    return len(grams) != len(set(grams))


def cycle_lm(V=9, a=4, b=5, bonus=10.0):
    """An LM that loves the bigram cycle a->b->a->b... (from BOS it jumps
    to a). Unblocked beams emit abab...; g=2 blocking must break the cycle."""
    logits = np.zeros((V, V), np.float32)
    logits[BOS, a] = bonus
    logits[a, b] = bonus
    logits[b, a] = bonus
    table = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)

    def step_fn(carry, toks):
        return carry + 1, table[toks]

    return step_fn


def test_block_bigram_breaks_cycle():
    step_fn = cycle_lm()
    init = jnp.zeros((1,), jnp.float32)
    K, L = 4, 8
    plain, plain_sc = beam_search(step_fn, init, 1, K, L)
    blocked, blocked_sc = beam_search(step_fn, init, 1, K, L,
                                      block_ngram_repeat=2)
    best_plain = _emitted(plain[0, 0])
    assert _has_repeat(best_plain, 2), "fixture must repeat when unblocked"
    for k in range(K):
        assert not _has_repeat(_emitted(blocked[0, k]), 2)
    assert _emitted(blocked[0, 0]) != best_plain


def test_block_unigram_all_distinct():
    step_fn = cycle_lm(a=4, b=4)  # self-loop: loves repeating one token
    init = jnp.zeros((1,), jnp.float32)
    tokens, _ = beam_search(step_fn, init, 1, 3, 6, block_ngram_repeat=1)
    for k in range(3):
        seq = _emitted(tokens[0, k])
        assert len(seq) == len(set(seq)), seq


def test_block_ngram_longer_than_output_is_identity():
    step_fn, _ = toy_lm(V=9, seed=5)
    init = {"prev": jnp.zeros((2,), jnp.int32), "junk": jnp.zeros((2, 3))}
    a_tok, a_sc = beam_search(step_fn, init, 2, 4, 6)
    b_tok, b_sc = beam_search(step_fn, init, 2, 4, 6, block_ngram_repeat=9)
    np.testing.assert_array_equal(np.asarray(a_tok), np.asarray(b_tok))
    np.testing.assert_allclose(np.asarray(a_sc), np.asarray(b_sc), rtol=1e-6)


def test_block_exclusion_tokens_exempt_the_cycle():
    step_fn = cycle_lm(a=4, b=5)
    init = jnp.zeros((1,), jnp.float32)
    plain, _ = beam_search(step_fn, init, 1, 4, 8)
    exempt, _ = beam_search(step_fn, init, 1, 4, 8, block_ngram_repeat=2,
                            exclusion_tokens=(4,))
    # every bigram of the cycle contains token 4 -> blocking never fires
    np.testing.assert_array_equal(np.asarray(exempt), np.asarray(plain))


@pytest.mark.parametrize("g", [1, 2, 3])
def test_block_ngram_property_fuzz(g):
    """Across random LMs, no returned hypothesis contains a repeated g-gram
    (whenever a legal unblocked continuation existed, which holds here:
    V=12 leaves headroom at these lengths)."""
    for seed in range(4):
        step_fn, _ = toy_lm(V=12, seed=seed)
        init = {"prev": jnp.zeros((2,), jnp.int32), "junk": jnp.zeros((2, 3))}
        tokens, _ = beam_search(step_fn, init, 2, 4, 7,
                                block_ngram_repeat=g)
        for b in range(2):
            for k in range(4):
                seq = _emitted(tokens[b, k])
                assert not _has_repeat(seq, g), (seed, b, k, seq)
