"""Regenerate tests/fixtures/tiktoken_golden_cl100k.json where tiktoken
IS installed (it is absent in the build sandbox).

The vendored fixture was hand-assembled from widely-documented
cl100k_base tokenizations (single common words = 1 token, leading-space
word merging, 3-digit number chunking, contraction splits); running this
script in any environment with tiktoken replaces every count with the
authoritative value and extends the set. Keep the texts ASCII-safe and
newline-explicit so the JSON round-trips bit-identically.

Usage: python tools/gen_tiktoken_golden.py [extra_texts.txt]
"""

from __future__ import annotations

import json
import os
import sys

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "tiktoken_golden_cl100k.json",
)


def main() -> int:
    try:
        import tiktoken
    except ImportError:
        print("tiktoken not installed; fixture left untouched", file=sys.stderr)
        return 1
    enc = tiktoken.get_encoding("cl100k_base")
    with open(FIXTURE) as f:
        data = json.load(f)
    texts = [t for t, _ in data["pairs"]]
    if len(sys.argv) > 1:
        with open(sys.argv[1]) as f:
            texts += [ln.rstrip("\n") for ln in f]
    seen: dict[str, int] = {}
    for t in texts:
        seen[t] = len(enc.encode_ordinary(t))
    data["pairs"] = [[t, n] for t, n in seen.items()]
    with open(FIXTURE, "w") as f:
        json.dump(data, f, indent=1)
    print(f"regenerated {len(seen)} golden pairs")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
