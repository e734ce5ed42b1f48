"""BLEU cross-checked against sacrebleu (available in the image) and METEOR
sanity checks."""

import numpy as np
import pytest

from variational_mmt_tpu.evals.bleu import corpus_bleu
from variational_mmt_tpu.evals.meteor import meteor_score


def test_perfect_match():
    hyp = [["a", "b", "c", "d", "e"]]
    refs = [[["a", "b", "c", "d", "e"]]]
    out = corpus_bleu(hyp, refs)
    assert abs(out["bleu"] - 100.0) < 1e-9
    assert out["bp"] == 1.0


def test_no_match():
    out = corpus_bleu([["x", "y", "z", "w"]], [[["a", "b", "c", "d"]]])
    assert out["bleu"] == 0.0


def test_brevity_penalty():
    hyp = [["a", "b"]]
    refs = [[["a", "b", "c", "d"]]]
    out = corpus_bleu(hyp, refs)
    assert out["bp"] < 1.0
    np.testing.assert_allclose(out["bp"], np.exp(1 - 4 / 2))


def test_matches_sacrebleu_tokenized():
    sacrebleu = pytest.importorskip("sacrebleu")
    rng = np.random.default_rng(0)
    vocab = [f"w{i}" for i in range(30)]
    hyps, refs = [], []
    for _ in range(40):
        L = int(rng.integers(3, 15))
        ref = [vocab[i] for i in rng.integers(0, 30, L)]
        hyp = list(ref)
        # perturb
        for j in range(len(hyp)):
            if rng.random() < 0.3:
                hyp[j] = vocab[int(rng.integers(0, 30))]
        if rng.random() < 0.3:
            hyp = hyp[:-1] if len(hyp) > 3 else hyp
        hyps.append(hyp)
        refs.append([ref])
    ours = corpus_bleu(hyps, refs)["bleu"]
    sb = sacrebleu.corpus_bleu(
        [" ".join(h) for h in hyps],
        [[" ".join(r[0]) for r in refs]],
        tokenize="none", smooth_method="none", force=True,
    ).score
    np.testing.assert_allclose(ours, sb, rtol=1e-6)


def test_multi_reference_closest_length():
    hyp = [["a", "b", "c"]]
    refs = [[["a", "b", "c", "d", "e", "f"], ["a", "b", "x"]]]
    out = corpus_bleu(hyp, refs)
    assert out["ref_len"] == 3  # closest reference length used
    assert out["bp"] == 1.0


def test_meteor_sanity():
    perfect = meteor_score([["a", "b", "c"]], [[["a", "b", "c"]]])["meteor"]
    nothing = meteor_score([["x", "y"]], [[["a", "b"]]])["meteor"]
    partial = meteor_score([["a", "b", "x"]], [[["a", "b", "c"]]])["meteor"]
    assert perfect > 90.0
    assert nothing == 0.0
    assert 0.0 < partial < perfect
    # word order matters (fragmentation penalty)
    ordered = meteor_score([["a", "b", "c", "d"]], [[["a", "b", "c", "d"]]])["meteor"]
    shuffled = meteor_score([["d", "c", "b", "a"]], [[["a", "b", "c", "d"]]])["meteor"]
    assert ordered > shuffled


def test_porter_stemmer_golden():
    from variational_mmt_tpu.evals.porter import stem

    # classic Porter paper examples
    cases = {
        "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
        "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
        "bled": "bled", "motoring": "motor", "sing": "sing", "conflated": "conflat",
        "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
        "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
        "filing": "file", "happy": "happi", "sky": "sky", "relational": "relat",
        "conditional": "condit", "rational": "ration", "valenci": "valenc",
        "digitizer": "digit", "operator": "oper", "feudalism": "feudal",
        "decisiveness": "decis", "hopefulness": "hope", "formaliti": "formal",
        "triplicate": "triplic", "formative": "form", "formalize": "formal",
        "electrical": "electr", "hopeful": "hope", "goodness": "good",
        "revival": "reviv", "allowance": "allow", "inference": "infer",
        "airliner": "airlin", "adjustable": "adjust", "defensible": "defens",
        "irritant": "irrit", "replacement": "replac", "adjustment": "adjust",
        "dependent": "depend", "adoption": "adopt", "communism": "commun",
        "activate": "activ", "angulariti": "angular", "homologous": "homolog",
        "effective": "effect", "bowdlerize": "bowdler", "probate": "probat",
        "rate": "rate", "cease": "ceas", "controll": "control", "roll": "roll",
    }
    for word, want in cases.items():
        assert stem(word) == want, (word, stem(word), want)


def test_meteor_stem_matching():
    from variational_mmt_tpu.evals.meteor import meteor_sentence

    # "riding" vs "rides" only match via stems
    exact0 = meteor_sentence(["he", "is", "riding"], [["he", "is", "rides"]])
    assert exact0 > meteor_sentence(["he", "is", "xxxxx"], [["he", "is", "rides"]])


def test_meteor_chunk_minimizing_alignment():
    """The aligner must pick the alignment with FEWER chunks when the match
    count ties — greedy left-to-right picks the wrong one here."""
    from variational_mmt_tpu.evals.meteor import MeteorScorer

    s = MeteorScorer("original")
    # hyp 'b b c': greedy matches hyp[0] b -> ref[2] b? No: greedy L-to-R
    # matches hyp b to the FIRST free ref b, splitting the 'b c' run.
    # ref: 'a b c', hyp: 'x b c'. One alignment: b->b, c->c contiguous
    # (2 matches, 1 chunk). There is no ambiguity here; use a real one:
    # ref: 'b a b c', hyp: 'b c'. Matches: b->ref0 + c->ref3 (2 chunks) OR
    # b->ref2 + c->ref3 (contiguous, 1 chunk). Beam must choose 1 chunk.
    m = s._align(["b", "c"], ["b", "a", "b", "c"])
    assert len(m) == 2
    assert MeteorScorer._chunks(m) == 1
    assert sorted((i, j) for i, j, _ in m) == [(0, 2), (1, 3)]


def test_meteor_golden_hand_computed():
    """Hand-computed METEOR (original params a=.9 b=3 g=.5):
    hyp 'the cat sat', ref 'the cat mat': m=2, P=R=2/3,
    Fmean = PR/(.9P+.1R) = (2/3)/1.0... = 2/3; chunks=1, frag=1/2,
    pen = .5*(1/2)^3 = 1/16; score = (1-1/16)*(2/3)."""
    from variational_mmt_tpu.evals.meteor import meteor_sentence

    got = meteor_sentence(["the", "cat", "sat"], [["the", "cat", "mat"]])
    p = r = 2.0 / 3.0
    fmean = p * r / (0.9 * p + 0.1 * r)
    want = (1 - 0.5 * (1 / 2) ** 3) * fmean
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_meteor_synonym_and_paraphrase_tables():
    from variational_mmt_tpu.evals.meteor import MeteorScorer

    base = MeteorScorer("original")
    with_syn = MeteorScorer("original", synonyms={"cat": {"feline"}})
    hyp, refs = ["the", "cat"], [["the", "feline"]]
    assert with_syn.sentence(hyp, refs) > base.sentence(hyp, refs)
    with_para = MeteorScorer("original", paraphrases={"sofa": {"couch"}})
    assert (with_para.sentence(["sofa"], [["couch"]])
            > base.sentence(["sofa"], [["couch"]]))


def test_meteor_load_table(tmp_path):
    from variational_mmt_tpu.evals.meteor import load_table

    p = tmp_path / "syn.txt"
    p.write_text("cat\tfeline kitty\ndog hound\n")
    t = load_table(str(p))
    assert t["cat"] == {"feline", "kitty"} and t["dog"] == {"hound"}


def test_meteor_15_preset_weighted_golden():
    """1.5-en preset hand check with a stem match and a function word:
    hyp 'the cats', ref 'the cat'.
    Matches: the->the (exact, w=1), cats->cat (stem, w=.6).
    delta=.75: 'the' is a function word (weight .25), 'cats'/'cat' content
    (weight .75). w_hyp = w_ref = 1.0;
    wm = 1*.25 + .6*.75 = .7 -> P = R = .7;
    Fmean = PR/(.85P+.15R) = .7; chunks=1, m=2, pen = .6*(.5)^.2.
    """
    from variational_mmt_tpu.evals.meteor import MeteorScorer

    s = MeteorScorer("1.5-en")
    got = s.sentence(["the", "cats"], [["the", "cat"]])
    pen = 0.6 * (0.5 ** 0.2)
    want = (1 - pen) * 0.7
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_meteor_corpus_micro_aggregation():
    """meteor-1.5 computes the SYSTEM score from corpus-aggregated
    statistics, not the mean of sentence scores. Hand math ('original'
    preset, delta=.5 so every token weighs .5):
      sent A: hyp==ref==[the cat] -> m=2 ch=1, P=R=1, F=1,
              pen=.5*(1/2)^3=.0625, score .9375
      sent B: hyp=[dog] ref=[cat] -> m=0, zero stats
      aggregate: wm=1.0, w_hyp=w_ref=1.5 -> P=R=2/3, F=2/3,
                 frag=1/2, pen=.0625 -> score .625
    """
    from variational_mmt_tpu.evals.meteor import meteor_score

    out = meteor_score(
        [["the", "cat"], ["dog"]],
        [[["the", "cat"]], [["cat"]]],
        preset="original",
    )
    assert abs(out["meteor"] - 62.5) < 1e-6
    assert abs(out["meteor_macro"] - 46.875) < 1e-6


def test_meteor_empty_hypothesis_counts_reference():
    """An empty hypothesis must still count its reference in the recall
    denominator — skipping it would inflate the micro-averaged score."""
    from variational_mmt_tpu.evals.meteor import meteor_score

    with_empty = meteor_score(
        [["the", "cat"], []],
        [[["the", "cat"]], [["the", "cat"]]],
        preset="original",
    )
    without = meteor_score([["the", "cat"]], [[["the", "cat"]]], preset="original")
    assert with_empty["meteor"] < without["meteor"] - 10  # recall halves
