"""Moses-style tokenization (pure Python, offline / host-side).

The reference consumes text that was Moses-tokenized + lowercased offline
(SURVEY.md §2.4). This module provides a lightweight, dependency-free
tokenizer/detokenizer adequate for Multi30k-style sentences so the framework
is usable end-to-end from raw text; users with Moses-preprocessed data can
skip it (``pretokenized=True`` paths just whitespace-split).
"""

from __future__ import annotations

import re
from typing import List

# Punctuation split rules in the spirit of Moses' tokenizer.perl:
# separate punctuation from words, keep decimals/abbreviation dots attached.
_RULES = [
    (re.compile(r"([\"“”„«»])"), r" \1 "),
    (re.compile(r"([,;:@#$%&!?()\[\]{}<>/\\|=+~*^])"), r" \1 "),
    # dots: split a final period, keep internal (e.g. "U.S." / "3.14")
    (re.compile(r"(?<!\.)\.(\s|$)"), r" . \1"),
    # apostrophes: split English clitics
    (re.compile(r"'(s|m|d|ll|re|ve|t)\b", re.IGNORECASE), r" '\1"),
    (re.compile(r"(?<=\w)'(?=\s|$)"), r" '"),
    # hyphen between spaces only (keep intra-word hyphens, Moses-like)
    (re.compile(r"\s-\s"), r" - "),
]

_WS = re.compile(r"\s+")


def tokenize(line: str, lower: bool = True) -> List[str]:
    s = line.strip()
    if lower:
        s = s.lower()
    for pat, repl in _RULES:
        s = pat.sub(repl, s)
    s = _WS.sub(" ", s).strip()
    return s.split(" ") if s else []


def detokenize(tokens: List[str]) -> str:
    """Inverse-ish of :func:`tokenize`; used for human-readable output only
    (BLEU is computed on tokenized text, matching multi-bleu.perl usage)."""
    out = " ".join(tokens)
    out = re.sub(r"\s+([,.;:!?)\]}])", r"\1", out)
    out = re.sub(r"([(\[{])\s+", r"\1", out)
    out = re.sub(r"\s+'", r"'", out)
    return out
