"""Real byte-pair-encoding tokenizer: vocab-file-driven merges, offsets,
and the reference's fixed-width tokenize contract (M6/M7).

Parity target is the reference's ``TokenizerWrapper``
(``src/data_processors/tokens/tokenizer_wrapper.py:1-15``): an HF
tokenizer called with ``padding="max_length", truncation=True,
max_length=expected_size`` returning ONE fixed-width int row per text.
The reference downloads a pretrained multilingual vocab; this engine is
network-free, so the vocab + merge table are TRAINED deterministically
(``train_bpe``; classic Sennrich BPE with lexicographic tie-breaks) and
checked in as a JSON artifact (``tools/build_bpe_vocab.py`` →
``mel_ray/data/bpe_vocab.json``) that :class:`BPETokenizer` loads —
vocab-FILE-driven merges, same as loading a pretrained tokenizer.

Encoding is the standard rank-greedy merge loop with a per-word cache:
the corpus lexicon is Zipfian, so amortized cost is O(unique words),
not O(tokens) — the same cache strategy HF's BPE uses.  The per-word
loop is NOT a hot-path violation: tokenization is inherently
sequential within a word; vectorization happens at the batch level
(one actor call tokenizes thousands of docs against one shared cache).
"""

from __future__ import annotations

import json
import re
from collections import Counter

import numpy as np

# specials (fixed ids; [M] is the reference's mention-boundary label
# token — tests/tokenization add it with tokenizer.add_tokens(["[M]"]))
PAD, UNK, CLS, SEP, MENTION = 0, 1, 2, 3, 4
SPECIALS = {"[PAD]": PAD, "[UNK]": UNK, "[CLS]": CLS, "[SEP]": SEP, "[M]": MENTION}
MENTION_TOKEN = "[M]"

# pre-tokenizer: the [M] special is atomic; words are \w+ runs; any
# other non-space char is its own pre-token
_PRETOK = re.compile(r"\[M\]|\w+|[^\w\s]")

_EOW = "</w>"  # end-of-word marker suffixed to a word's last symbol


def _word_symbols(word: str) -> tuple[str, ...]:
    if len(word) == 1:
        return (word + _EOW,)
    return tuple(word[:-1]) + (word[-1] + _EOW,)


def train_bpe(texts, num_merges: int = 2048) -> dict:
    """Deterministic Sennrich-style BPE training over an iterable of
    texts: repeatedly merge the most frequent adjacent symbol pair,
    breaking count ties lexicographically (so the artifact is stable
    across runs/platforms).  Returns the serializable artifact dict
    ``{"merges": [[a, b], ...], "vocab": {token: id}}``."""
    word_freq: Counter[str] = Counter()
    for t in texts:
        word_freq.update(m.group(0) for m in _PRETOK.finditer(t))
    for s in SPECIALS:
        word_freq.pop(s, None)
    words = [(list(_word_symbols(w)), n) for w, n in sorted(word_freq.items())]

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: Counter[tuple[str, str]] = Counter()
        for syms, n in words:
            for i in range(len(syms) - 1):
                pair_counts[(syms[i], syms[i + 1])] += n
        if not pair_counts:
            break
        best = min(pair_counts, key=lambda p: (-pair_counts[p], p))
        if pair_counts[best] < 2:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        for syms, _ in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [ab]
                else:
                    i += 1

    # vocab: specials, then every base symbol, then merge products, each
    # in first-created order (matches GPT-2/Sennrich artifact layout)
    vocab: dict[str, int] = dict(SPECIALS)
    base: set[str] = set()
    for w in word_freq:
        base.update(_word_symbols(w))
    for s in sorted(base):
        vocab.setdefault(s, len(vocab))
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab))
    return {"merges": [list(m) for m in merges], "vocab": vocab}


class BPETokenizer:
    """Vocab-file-driven BPE encoder with offsets and the fixed-width
    tokenize contract.

    ``tokenize(text, max_length)`` == the reference TokenizerWrapper
    call (tokenizer_wrapper.py:6-15): ``[CLS] ids[:max_length-2] [SEP]``
    padded with ``[PAD]`` to exactly ``max_length`` (HF
    ``padding="max_length", truncation=True`` semantics).

    ``encode_with_offsets`` == the cutter's side-step call
    (tokens_cutter.py:45-50: ``add_special_tokens=False,
    return_offsets_mapping=True``): raw subword ids plus one (start,
    end) char span per token.
    """

    def __init__(self, artifact: dict):
        self.vocab: dict[str, int] = dict(artifact["vocab"])
        self.ranks: dict[tuple[str, str], int] = {
            (a, b): i for i, (a, b) in enumerate(artifact["merges"])
        }
        self.inv_vocab = {i: t for t, i in self.vocab.items()}
        self._cache: dict[str, tuple[str, ...]] = {}

    @classmethod
    def from_file(cls, path: str) -> "BPETokenizer":
        with open(path) as f:
            return cls(json.load(f))

    # -- core BPE ----------------------------------------------------------

    def _encode_word(self, word: str) -> tuple[str, ...]:
        got = self._cache.get(word)
        if got is not None:
            return got
        syms = list(_word_symbols(word))
        while len(syms) > 1:
            best_i, best_r = -1, None
            for i in range(len(syms) - 1):
                r = self.ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_r is None or r < best_r):
                    best_i, best_r = i, r
            if best_r is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        out = tuple(syms)
        self._cache[word] = out
        return out

    def encode_with_offsets(self, text: str) -> tuple[np.ndarray, list[tuple[int, int]]]:
        """No-specials subword ids + per-token char spans.  Within a
        word, spans are assigned by accumulating merged-symbol char
        widths (``</w>`` is zero-width), so spans exactly tile each
        pre-token — the offset_mapping contract the cutter's
        token_to_chars math relies on (tokens_cutter.py:134-160)."""
        ids: list[int] = []
        offsets: list[tuple[int, int]] = []
        unk = UNK
        for m in _PRETOK.finditer(text):
            w = m.group(0)
            s = m.start()
            sp = SPECIALS.get(w)
            if sp is not None:
                ids.append(sp)
                offsets.append((s, m.end()))
                continue
            pos = s
            for sym in self._encode_word(w):
                width = len(sym) - len(_EOW) if sym.endswith(_EOW) else len(sym)
                ids.append(self.vocab.get(sym, unk))
                offsets.append((pos, pos + width))
                pos += width
        return np.asarray(ids, dtype=np.int32), offsets

    def encode(self, text: str) -> np.ndarray:
        return self.encode_with_offsets(text)[0]

    # -- the reference tokenize contract ------------------------------------

    def tokenize(self, text: str, max_length: int = 64) -> np.ndarray:
        """One fixed-width int32 row: CLS + body (truncated) + SEP, PAD
        to ``max_length`` (tokenizer_wrapper.py:6-15 semantics)."""
        body = self.encode(text)[: max_length - 2]
        out = np.full(max_length, PAD, dtype=np.int32)
        out[0] = CLS
        out[1 : 1 + len(body)] = body
        out[1 + len(body)] = SEP
        return out

    def decode(self, ids) -> str:
        """Inverse for diagnostics/cutter: specials verbatim, ``</w>``
        becomes a space."""
        parts = []
        for i in ids:
            t = self.inv_vocab.get(int(i), "[UNK]")
            parts.append(t.replace(_EOW, " "))
        return "".join(parts).strip()
