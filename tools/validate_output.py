"""Offline tree-equality validator CLI: are two Parquet output trees the
same ROW MULTISET, regardless of row order and partitioning?

Thin wrapper around :mod:`mel_ray.state.validate` (the streaming
multiset-fingerprint comparison — the Ray recast of the reference's
``src/tokenization/validate_tokens.py:18-142`` sorted-multiset dir
comparison).

Usage::

    python tools/validate_output.py TREE_A TREE_B [--columns=a,b,c]

Exit code 0 iff schemas (names + types) and row multisets match.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv: list[str]) -> int:
    import json

    from mel_ray.state.validate import validate_trees

    args = [a for a in argv if not a.startswith("--")]
    columns = None
    for a in argv:
        if a.startswith("--columns="):
            columns = a.split("=", 1)[1].split(",")
    if len(args) != 2:
        print(__doc__)
        return 2
    report = validate_trees(args[0], args[1], columns)
    print(json.dumps(report, indent=1, sort_keys=True))
    return 0 if report["multiset_match"] else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
