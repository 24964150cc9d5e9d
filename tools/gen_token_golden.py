"""Regenerate the checked-in golden token tables for the tokenization
oracles (mel_ray/data/golden_doc_tokens.parquet,
golden_mention_cut.parquet).

Each golden is long-format (doc_id, text_md5, pos, token_id) spanning
every testdata scale dir, content-addressed by md5(text) so the oracle
SQL self-selects the rows matching the live documents view at whatever
scale the driver runs.  Re-run ONLY when the tokenizer artifact or cut
semantics intentionally change; the commit diff is then the review
surface (the reference reviews tokenizer-output changes the same way —
its tests pin stored token tables).

Usage: python tools/gen_token_golden.py [sf_dir ...]
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mel_ray.functions.bpe import BPETokenizer  # noqa: E402
from mel_ray.functions.tokens_cut import cut_mention_with_context  # noqa: E402
from mel_ray.stages.tokenize import DEFAULT_VOCAB, CutMentions, _long_format  # noqa: E402

WIDTH = 64


def golden_for(sf_dir: str, tok: BPETokenizer) -> tuple[pa.Table, pa.Table]:
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    doc_ids = t["doc_id"].to_numpy()
    texts = t["text"].to_pylist()
    md5s = [hashlib.md5((x or "").encode()).hexdigest() for x in texts]

    tok_rows = [tok.tokenize(x or "", WIDTH) for x in texts]
    tok_tbl = _long_format(doc_ids, tok_rows, WIDTH)

    cut_ids, cut_rows, cut_md5 = [], [], []
    for did, text, h in zip(doc_ids, texts, md5s):
        marked = CutMentions.mark_middle_word(text or "")
        if not marked:
            continue
        cut_rows.append(cut_mention_with_context(marked, tok, WIDTH))
        cut_ids.append(did)
        cut_md5.append(h)
    import numpy as np

    cut_tbl = _long_format(np.asarray(cut_ids, dtype=np.int64), cut_rows, WIDTH)

    def with_md5(tbl: pa.Table, hashes: list[str]) -> pa.Table:
        rep = pa.array([h for h in hashes for _ in range(WIDTH)], pa.string())
        return tbl.append_column("text_md5", rep)

    return with_md5(tok_tbl, md5s), with_md5(cut_tbl, cut_md5)


def main() -> None:
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    tok = BPETokenizer.from_file(DEFAULT_VOCAB)
    tok_parts, cut_parts = [], []
    for d in sf_dirs:
        a, b = golden_for(d, tok)
        tok_parts.append(a)
        cut_parts.append(b)
    out_dir = Path(__file__).resolve().parent.parent / "mel_ray" / "data"
    # distinct (text_md5, ...) rows: identical docs across scales collapse
    for name, parts in (
        ("golden_doc_tokens.parquet", tok_parts),
        ("golden_mention_cut.parquet", cut_parts),
    ):
        tbl = pa.concat_tables(parts)
        df = tbl.to_pandas().drop_duplicates(["doc_id", "text_md5", "pos"])
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False), out_dir / name
        )
        print(f"wrote {out_dir / name}: {len(df)} rows")


if __name__ == "__main__":
    main()
