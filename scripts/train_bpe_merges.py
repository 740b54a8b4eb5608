"""Train the deterministic BPE merge table committed in functions/bpe.py.

Classic byte-pair-encoding training (Sennrich et al., "Neural Machine
Translation of Rare Words with Subword Units", ACL 2016) over the letter
runs of the synthetic ``documents`` corpus (seed 42 — TESTDATA.md), with
two determinism pins:

- ties on pair frequency break to the lexicographically smallest pair,
- merge application is greedy left-to-right (the same semantics as
  chained string ``replace`` on the pipe-delimited form, which is how the
  engine and the DuckDB oracle apply the merges).

Run: python scripts/train_bpe_merges.py [sf_dir] [n_merges]
Paste the printed tuple into fraudcrawler_spark/functions/bpe.py.
"""

from __future__ import annotations

import re
import sys
from collections import Counter

import pyarrow.parquet as pq

_LETTERS = re.compile(r"[a-zA-Z]+")


def apply_merge(sym: list[str], a: str, b: str) -> list[str]:
    out, i = [], 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def train(words: Counter, n_merges: int) -> list[tuple[str, str]]:
    vocab = {w: list(w) for w in words}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, cnt in words.items():
            sym = vocab[w]
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for w in vocab:
            vocab[w] = apply_merge(vocab[w], *best)
    return merges


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    texts = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    words: Counter = Counter()
    for t in texts.column("text").to_pylist():
        if t:
            words.update(_LETTERS.findall(t))
    merges = train(words, n_merges)
    print("BPE_MERGES = (")
    for a, b in merges:
        print(f"    ({a!r}, {b!r}),")
    print(")")


if __name__ == "__main__":
    main()
