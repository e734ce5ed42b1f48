"""Vocabulary with the reference's special-token contract.

OpenNMT-py fixes ids 0..3 as <blank>/<unk>/<s>/</s> via torchtext Fields
(SURVEY.md §2.1 #5). We keep the same order so padding can be id 0
(cheap masking: ``ids != 0``).
"""

from __future__ import annotations

import collections
import json
from typing import Dict, Iterable, List, Sequence

PAD, UNK, BOS, EOS = 0, 1, 2, 3
PAD_TOK, UNK_TOK, BOS_TOK, EOS_TOK = "<blank>", "<unk>", "<s>", "</s>"
SPECIALS = [PAD_TOK, UNK_TOK, BOS_TOK, EOS_TOK]


class Vocab:
    def __init__(self, itos: List[str]):
        assert itos[:4] == SPECIALS, "specials must occupy ids 0..3"
        self.itos = list(itos)
        self.stoi: Dict[str, int] = {s: i for i, s in enumerate(self.itos)}

    def __len__(self) -> int:
        return len(self.itos)

    def __contains__(self, tok: str) -> bool:
        return tok in self.stoi

    def pad_to_multiple(self, m: int) -> None:
        """Append inert filler types until len(vocab) % m == 0 (tensor
        parallelism shards embedding/generator tables over the vocab dim and
        needs it divisible by the TP degree). Filler tokens never appear in
        data, so their rows train to ~init and their generator logits are
        harmless constants under the full-softmax normalizer."""
        i = 0
        while len(self.itos) % m != 0:
            tok = f"<vpad{i}>"
            while tok in self.stoi:
                i += 1
                tok = f"<vpad{i}>"
            self.stoi[tok] = len(self.itos)
            self.itos.append(tok)
            i += 1

    @classmethod
    def build(
        cls,
        lines: Iterable[Sequence[str]],
        max_size: int = 0,
        min_freq: int = 1,
    ) -> "Vocab":
        counter = collections.Counter()
        for toks in lines:
            counter.update(toks)
        # frequency desc, then lexicographic — deterministic like torchtext
        items = sorted(counter.items(), key=lambda kv: (-kv[1], kv[0]))
        itos = list(SPECIALS)
        for tok, freq in items:
            if freq < min_freq:
                continue
            if max_size and len(itos) >= max_size + len(SPECIALS):
                break
            if tok in SPECIALS:
                continue
            itos.append(tok)
        return cls(itos)

    def encode(self, tokens: Sequence[str], bos: bool = False, eos: bool = False) -> List[int]:
        ids = [self.stoi.get(t, UNK) for t in tokens]
        if bos:
            ids = [BOS] + ids
        if eos:
            ids = ids + [EOS]
        return ids

    def decode(self, ids: Sequence[int], strip_special: bool = True) -> List[str]:
        out = []
        for i in ids:
            i = int(i)
            if strip_special:
                if i == EOS:
                    break
                if i in (PAD, BOS):
                    continue
            out.append(self.itos[i] if 0 <= i < len(self.itos) else UNK_TOK)
        return out

    def ids_to_text(self, ids: Sequence[int], debpe: bool = True) -> str:
        """Hypothesis ids -> final text: vocab decode (specials kept for
        positional fidelity with attention) then BPE-joiner removal. THE
        single definition of output detokenization — Translator.nbest_to_text
        and the jax-free MP dispatchers (serve/frontend.py id-level wire)
        both call it, so online answers cannot drift from the offline CLI."""
        from variational_mmt_tpu.data.bpe import remove_bpe

        toks = self.decode(ids, strip_special=False)
        return " ".join(remove_bpe(toks) if debpe else toks)

    # -- persistence -------------------------------------------------
    def save(self, path: str) -> None:
        with open(path, "w", encoding="utf-8") as f:
            json.dump(self.itos, f, ensure_ascii=False)

    @classmethod
    def load(cls, path: str) -> "Vocab":
        with open(path, encoding="utf-8") as f:
            return cls(json.load(f))

    def to_list(self) -> List[str]:
        return list(self.itos)
