"""METEOR (exact + Porter-stem matchers).

The reference reports METEOR via the external Java meteor-1.5 jar
(SURVEY.md §2.1 #16), which this environment cannot ship. This implements
the METEOR scoring formula (Lavie & Agarwal 2007) with the exact and
Porter-stem matcher stages (no WordNet synonym/paraphrase tables): unigram
precision/recall with recall-weighted harmonic mean and a fragmentation
penalty over chunks. Scores correlate with but are not identical to
meteor-1.5; BLEU is the parity gate (BASELINE.md), METEOR is supplementary.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

from variational_mmt_tpu.evals.porter import stem


def _align(hyp: List[str], ref: List[str]):
    """Two-stage alignment (meteor module order): exact matches first, then
    Porter-stem matches over the leftovers. Greedy left-to-right."""
    used_ref = [False] * len(ref)
    used_hyp = [False] * len(hyp)
    matches = []  # (hyp_idx, ref_idx)
    for i, h in enumerate(hyp):
        for j, r in enumerate(ref):
            if not used_ref[j] and h == r:
                used_ref[j] = True
                used_hyp[i] = True
                matches.append((i, j))
                break
    hyp_stems = [stem(h) for h in hyp]
    ref_stems = [stem(r) for r in ref]
    for i, hs in enumerate(hyp_stems):
        if used_hyp[i]:
            continue
        for j, rs in enumerate(ref_stems):
            if not used_ref[j] and hs == rs:
                used_ref[j] = True
                used_hyp[i] = True
                matches.append((i, j))
                break
    return matches


def _chunks(matches) -> int:
    if not matches:
        return 0
    matches = sorted(matches)
    chunks = 1
    for (i1, j1), (i2, j2) in zip(matches, matches[1:]):
        if not (i2 == i1 + 1 and j2 == j1 + 1):
            chunks += 1
    return chunks


def meteor_sentence(hyp: Sequence[str], refs: Sequence[Sequence[str]],
                    alpha: float = 0.9, beta: float = 3.0, gamma: float = 0.5) -> float:
    best = 0.0
    hyp = list(hyp)
    for ref in refs:
        ref = list(ref)
        matches = _align(hyp, ref)
        m = len(matches)
        if m == 0 or not hyp or not ref:
            continue
        p = m / len(hyp)
        r = m / len(ref)
        f_mean = p * r / (alpha * p + (1 - alpha) * r)
        frag = _chunks(matches) / m
        penalty = gamma * (frag ** beta)
        best = max(best, f_mean * (1.0 - penalty))
    return best


def meteor_score(
    hypotheses: Sequence[Sequence[str]],
    references: Sequence[Sequence[Sequence[str]]],
) -> Dict[str, float]:
    scores = [meteor_sentence(h, r) for h, r in zip(hypotheses, references)]
    return {"meteor": 100.0 * (sum(scores) / max(1, len(scores)))}
