"""Partitioned Bloom-filter URL-seen segments.

The reference keeps the seen set as one in-memory ``Set[str]`` behind a
single-threaded collector (orchestrator.py:92-93,150-188) — the
serialization point of its pipeline. At 10^10 URLs that is ~1 TB of raw
strings; instead we hash-partition by ``crc32(canonical_url) % P``
(F.crc32 in Spark, zlib.crc32 in the trace simulator — bit-identical)
and keep one numpy-bitarray Bloom segment per partition (10 bits/key ⇒
~1% FP at k=7; 10^10 keys ≈ 12.5 GB total ≈ 100 MB × 128 segments —
each segment fits comfortably in one executor task).

Correctness contract (north_rule: EXACT seen-set match): the Bloom is
only a pre-filter. Definite-negatives skip the expensive path; positives
are CONFIRMED by an exact anti-join against the persisted ``seen`` url
table, so a false positive can never drop a URL.

Bloom membership hashing uses blake2b(url, salt=i) double-hashing —
pure-Python per batch inside Arrow-batched kernels (no per-row Spark
Python). Segments serialize to bytes for parquet checkpointing.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from fraudcrawler_spark.config import BLOOM_BITS_PER_KEY, BLOOM_NUM_HASHES


def _hash_pair(url: str) -> tuple[int, int]:
    d = hashlib.blake2b(url.encode("utf-8"), digest_size=16).digest()
    return int.from_bytes(d[:8], "little"), int.from_bytes(d[8:], "little")


class BloomSegment:
    """Fixed-size bit-array Bloom filter over urls of one hash partition."""

    def __init__(self, capacity: int, bits: np.ndarray | None = None,
                 n_hashes: int = BLOOM_NUM_HASHES):
        self.capacity = max(int(capacity), 64)
        self.m = self.capacity * BLOOM_BITS_PER_KEY
        self.n_hashes = n_hashes
        n_words = (self.m + 63) // 64
        if bits is None:
            self.bits = np.zeros(n_words, dtype=np.uint64)
        else:
            self.bits = bits.copy()

    def _positions(self, url: str) -> np.ndarray:
        # double hashing in Python ints (no uint64 overflow semantics to fight)
        h1, h2 = _hash_pair(url)
        return np.array(
            [(h1 + i * h2) % self.m for i in range(self.n_hashes)], dtype=np.uint64
        )

    def add_many(self, urls) -> None:
        for u in urls:
            pos = self._positions(u)
            # bitwise_or.at: two positions of one key may land in the same
            # 64-bit word — fancy-indexed |= would silently drop one
            np.bitwise_or.at(
                self.bits,
                pos >> np.uint64(6),
                np.uint64(1) << (pos & np.uint64(63)),
            )

    def contains_many(self, urls) -> np.ndarray:
        out = np.empty(len(urls), dtype=bool)
        for i, u in enumerate(urls):
            pos = self._positions(u)
            words = self.bits[pos >> np.uint64(6)]
            mask = np.uint64(1) << (pos & np.uint64(63))
            out[i] = bool(np.all(words & mask != 0))
        return out

    def to_bytes(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, capacity: int,
                   n_hashes: int = BLOOM_NUM_HASHES) -> "BloomSegment":
        bits = np.frombuffer(data, dtype=np.uint64)
        seg = cls(capacity, bits=bits, n_hashes=n_hashes)
        return seg


def segments_to_pdf(segments: dict[int, BloomSegment],
                    n_items: dict[int, int] | None = None) -> pd.DataFrame:
    """{part → segment} → checkpointable pandas frame."""
    return pd.DataFrame(
        {
            "part": list(segments.keys()),
            "capacity": [s.capacity for s in segments.values()],
            "n_hashes": [s.n_hashes for s in segments.values()],
            "n_items": [int((n_items or {}).get(p, 0)) for p in segments],
            "bitmap": [s.to_bytes() for s in segments.values()],
        }
    )


def new_segment(kind: str, capacity: int):
    """Segment factory: 'bloom' (default) or 'cuckoo' (supports delete)."""
    if kind == "cuckoo":
        from fraudcrawler_spark.frontier.cuckoo import CuckooSegment

        return CuckooSegment(capacity)
    return BloomSegment(capacity)


def segments_from_pdf(pdf: pd.DataFrame):
    """Checkpoint rows → {part → segment}. Rows self-describe their kind:
    n_hashes >= 0 is a Bloom row, the -1 sentinel a cuckoo row — mixed
    checkpoints stay readable."""
    from fraudcrawler_spark.frontier.cuckoo import CUCKOO_KIND_SENTINEL, CuckooSegment

    out = {}
    for r in pdf.itertuples():
        if int(r.n_hashes) == CUCKOO_KIND_SENTINEL:
            out[int(r.part)] = CuckooSegment.from_bytes(r.bitmap, int(r.capacity))
        else:
            out[int(r.part)] = BloomSegment.from_bytes(
                r.bitmap, int(r.capacity), int(r.n_hashes)
            )
    return out
