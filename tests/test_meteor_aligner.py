"""METEOR aligner optimality (round-2 verdict #5).

The production aligner is exact-first: a budgeted bitmask DP optimizing
meteor's objective (max matches, then min chunks, then min module sum),
with the BEAM=40 search as fallback only past the state budget. These
tests bound it against an unbudgeted exact run, and DOCUMENT the fallback
beam's measured divergence (the reason exact-first is the default: the
beam provably misses chunk-optimal alignments on dense-match sentences —
meteor-1.5's jar aligner is beam-limited everywhere and shares that gap).
"""

import random

from variational_mmt_tpu.evals.meteor import MeteorScorer


def _random_pair(rng, max_len, vocab):
    """Sentence pairs over a small shared vocab so matches (incl. repeated
    words — the hard case for one-to-one alignment) are dense."""
    h = [rng.choice(vocab) for _ in range(rng.randint(0, max_len))]
    r = [rng.choice(vocab) for _ in range(rng.randint(1, max_len))]
    return h, r


def test_production_aligner_exact_up_to_8_tokens():
    """Property: on all random pairs up to 8 tokens the production aligner
    attains the exact optimum of its objective."""
    rng = random.Random(0)
    sc = MeteorScorer("original")
    vocab = ["dog", "dogs", "cat", "the", "a", "runs", "running", "fast"]
    for _ in range(400):
        h, r = _random_pair(rng, 8, vocab)
        got = sc._align_key(sc._align(h, r))
        exact = sc._align_exact_key(h, r)
        assert got == exact, (h, r, got, exact)


def test_production_aligner_exact_with_synonyms():
    """Same bound with the synonym/paraphrase modules active (module-sum
    tie-breaking exercised)."""
    rng = random.Random(1)
    sc = MeteorScorer(
        "1.5-en",
        synonyms={"dog": {"hound"}, "fast": {"quick"}},
        paraphrases={"runs": {"sprints"}},
    )
    vocab = ["dog", "hound", "quick", "fast", "runs", "sprints", "the", "cat"]
    for _ in range(300):
        h, r = _random_pair(rng, 8, vocab)
        got = sc._align_key(sc._align(h, r))
        exact = sc._align_exact_key(h, r)
        assert got == exact, (h, r, got, exact)


def test_production_aligner_exact_longer_pairs():
    """Fuzz on longer pairs (up to 11 tokens): still within the state
    budget, so still exactly optimal."""
    rng = random.Random(2)
    sc = MeteorScorer("original")
    vocab = ["w%d" % k for k in range(5)] + ["dog", "dogs", "cat", "run"]
    for _ in range(120):
        h, r = _random_pair(rng, 11, vocab)
        got = sc._align_key(sc._align(h, r))
        exact = sc._align_exact_key(h, r)
        assert got == exact, (h, r, got, exact)


def test_beam_fallback_divergence_documented():
    """The fallback beam IS measurably suboptimal — this test documents the
    divergence rate on dense-match pairs rather than hiding it. Known
    counterexamples (found by the round-3 fuzz): chunk-level misses like
    (5 matches, 5 chunks) vs the optimal (5 matches, 4 chunks). If the
    beam ever regresses past 10% divergence on this distribution, look at
    BEAM or the sort key."""
    rng = random.Random(3)
    sc = MeteorScorer(
        "1.5-en",
        synonyms={"dog": {"hound"}, "fast": {"quick"}},
        paraphrases={"runs": {"sprints"}},
    )
    vocab = ["dog", "hound", "quick", "fast", "runs", "sprints", "the", "cat"]
    n, diverged = 300, 0
    for _ in range(n):
        h, r = _random_pair(rng, 8, vocab)
        beam = sc._align_key(sc._align_beam(h, r))
        exact = sc._align_exact_key(h, r)
        assert beam[0] <= exact[0] or (beam[0], beam[1], beam[2]) >= exact, "beam beat exact?!"
        if beam != exact:
            diverged += 1
    assert diverged / n < 0.10, f"beam divergence {diverged}/{n}"


def test_budget_fallback_still_valid():
    """Past the state budget the aligner falls back to the beam and still
    returns a valid one-to-one alignment (adversarial repeated-word pair
    whose DP state space explodes)."""
    sc = MeteorScorer("original")
    h = ["the"] * 18 + ["cat"] * 6
    r = ["the"] * 18 + ["cat"] * 6
    assert sc._align_exact(h, r, budget=1000) is None  # budget actually binds
    matches = sc._align(h, r)
    assert len(matches) == 24
    refs = [j for _, j, _ in matches]
    assert len(set(refs)) == len(refs)  # one-to-one
    assert sc._chunks(matches) == 1  # identity alignment found by the beam


def test_exact_key_hand_case():
    """Hand-checkable case: 'the cat the' vs 'the the cat' — all three hyp
    words match one-to-one; best alignment has 2 chunks."""
    sc = MeteorScorer("original")
    h = ["the", "cat", "the"]
    r = ["the", "the", "cat"]
    exact = sc._align_exact_key(h, r)
    assert exact[0] == 3
    assert exact == sc._align_key(sc._align(h, r))
