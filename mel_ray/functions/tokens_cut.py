"""Token-budget-aware mention/context recut (M8/M9).

Faithful re-expression of the reference's ``TokensCutter``
(``src/data_processors/tokens/tokens_cutter.py:33-163``): given a text
containing a mention bracketed by the ``[M]`` label token, produce ONE
fixed-width token row (``expected_size``) that always contains the
mention and spends the remaining budget on context, choosing a
mid / more-on-right / more-on-left cut exactly like the reference:

* mention span = first..second occurrence of the label token in the
  no-specials encoding (tokens_cutter.py:10-30 fast_token_mention_span);
* mention longer than ``expected_size - 4`` -> keep only its first
  ``expected_size - 4`` tokens and re-append the closing label
  (tokens_cutter.py:70-87 _cut_only_mention);
* else split the leftover budget ``remains`` into ``remains // 2`` left
  and the rest right; if that window fits inside the text -> mid cut,
  if it underflows the left edge -> more-on-right, else more-on-left
  (tokens_cutter.py:108-161), each realized as a CHAR slice via the
  token offsets and re-tokenized at full width so padding/truncation
  land exactly like the reference's final ``tokenizer_wrapper.tokenize``
  call.
"""

from __future__ import annotations

import numpy as np

from .bpe import MENTION, MENTION_TOKEN, BPETokenizer


def token_mention_span(ids: np.ndarray, label_id: int = MENTION) -> tuple[int, int]:
    """First/second label-token occurrence -> [start, stop) span that
    INCLUDES both label tokens (tokens_cutter.py:10-30)."""
    hits = np.flatnonzero(ids == label_id)
    if len(hits) < 2:
        raise ValueError(f"mention not found: label {label_id} occurs {len(hits)}x")
    return int(hits[0]), int(hits[1]) + 1


def cut_mention_with_context(
    text: str, tok: BPETokenizer, expected_size: int = 64
) -> np.ndarray:
    ids, offsets = tok.encode_with_offsets(text)
    start, stop = token_mention_span(ids)
    size_wo_specials = expected_size - 2  # CLS/SEP budget
    span_len = stop - start

    if span_len > size_wo_specials - 2:
        # mention alone exceeds the budget: truncate the mention itself
        # and restore the closing label (tokens_cutter.py:70-87)
        stop = min(stop, start + size_wo_specials - 2)
        piece = text[offsets[start][0] : offsets[stop - 1][1]] + MENTION_TOKEN
        return tok.tokenize(piece, max_length=expected_size)

    remains = size_wo_specials - span_len
    left = start - remains // 2
    right = stop + (remains - remains // 2)
    if left >= 0 and right <= len(ids):
        # mid cut (tokens_cutter.py:134-140)
        return tok.tokenize(
            text[offsets[left][0] : offsets[right - 1][1]], max_length=expected_size
        )
    if left < 0:
        # more on right (tokens_cutter.py:142-150)
        end_tok = min(size_wo_specials - 1, len(ids) - 1)
        return tok.tokenize(text[: offsets[end_tok][1]], max_length=expected_size)
    # more on left (tokens_cutter.py:152-160)
    start_tok = max(0, len(ids) - size_wo_specials)
    return tok.tokenize(text[offsets[start_tok][0] :], max_length=expected_size)
