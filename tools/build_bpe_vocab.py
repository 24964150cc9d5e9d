"""Train the checked-in BPE artifact (vocab + merge table).

Network-free stand-in for "download a pretrained tokenizer": trains
classic Sennrich BPE deterministically over the sf0.01 documents table
(lexicographic tie-breaks make the artifact byte-stable) and writes
``mel_ray/data/bpe_vocab.json``.  Re-run only when the training corpus
or num_merges changes — the artifact is committed, exactly like a
pretrained vocab file.

Usage: python tools/build_bpe_vocab.py [sf_dir] [num_merges]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mel_ray.functions.bpe import train_bpe  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    num_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    texts = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    art = train_bpe(texts, num_merges=num_merges)
    out = Path(__file__).resolve().parent.parent / "mel_ray" / "data" / "bpe_vocab.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(art, sort_keys=True))
    print(f"wrote {out}: {len(art['merges'])} merges, {len(art['vocab'])} vocab entries")


if __name__ == "__main__":
    main()
