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

Membership hashing (round 3 — zero per-url Python on the hot path):
``h1 = F.xxhash64(url)`` is computed AS A JVM COLUMN before the cogroup;
inside the Arrow kernel ``h2 = splitmix64(h1) | 1`` is derived with
vectorized numpy, and the k probe positions ``(h1 + i*h2) mod m`` are one
broadcasted uint64 matrix op. The string-facing ``add_many`` /
``contains_many`` API remains for tests and the trace simulator, backed
by ``xxhash64_py`` — a pinned pure-Python XXH64 (seed 42) verified
bit-identical to Spark's ``F.xxhash64`` in tests/test_round3.py, so
segments built on either path agree.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from fraudcrawler_spark.config import BLOOM_BITS_PER_KEY, BLOOM_NUM_HASHES

# ---------------------------------------------------------------------------
# Spark-compatible XXH64 (seed 42) — the Python twin of F.xxhash64(col).
# Used only on string-API paths (unit tests, ad-hoc callers); the crawl hot
# path receives the hash as a JVM-computed int64 column.
# ---------------------------------------------------------------------------
# Version of the MEMBERSHIP HASH baked into serialized segment bitmaps.
# v1 = blake2b double-hash (rounds 1-2); v2 = xxhash64 + splitmix64 (r3).
# Persisted in the crawl manifest and checked on resume: probing a
# v1-built bitmap with v2 positions yields pervasive false negatives
# (re-claimed duplicates), so a mismatch must fail loudly, like the
# partition-layout params already do.
SEEN_HASH_VERSION = 2

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xxh_round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def _xxh_merge(h: int, v: int) -> int:
    h ^= _xxh_round(0, v)
    return ((h * _P1) + _P4) & _M64


def xxhash64_py(data: bytes, seed: int = 42) -> int:
    """XXH64 over bytes, bit-identical to Spark's xxhash64 (default seed 42).

    Returns the UNSIGNED 64-bit value; Spark's column is the same bits as
    signed int64 (reinterpret with ``.view(np.uint64)`` / two's complement).
    """
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i <= n - 32:
            v1 = _xxh_round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _xxh_round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _xxh_round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _xxh_round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        h = _xxh_merge(h, v1)
        h = _xxh_merge(h, v2)
        h = _xxh_merge(h, v3)
        h = _xxh_merge(h, v4)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i <= n - 8:
        h ^= _xxh_round(0, int.from_bytes(data[i:i + 8], "little"))
        h = ((_rotl(h, 27) * _P1) + _P4) & _M64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M64
        h = ((_rotl(h, 23) * _P2) + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def hash_urls(urls) -> np.ndarray:
    """Vector of xxhash64(url) as uint64 — Python twin of the JVM column."""
    return np.fromiter(
        (xxhash64_py(u.encode("utf-8")) for u in urls),
        dtype=np.uint64,
        count=len(urls),
    )


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants) — derives
    the second/double hash from the JVM xxhash64 column with zero extra
    per-url cost. uint64 arithmetic wraps mod 2^64 by numpy semantics."""
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def series_u64(series: pd.Series) -> np.ndarray:
    """Arrow int64 hash column → uint64 numpy view (no per-row work)."""
    return np.ascontiguousarray(
        series.to_numpy(dtype=np.int64, copy=False)
    ).view(np.uint64)


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

    def _positions(self, h1: np.ndarray) -> np.ndarray:
        """(n_urls, k) probe-position matrix — pure vectorized uint64."""
        h2 = splitmix64(h1) | np.uint64(1)
        i = np.arange(self.n_hashes, dtype=np.uint64)
        return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(self.m)

    # -- hashed API: the hot path (JVM xxhash64 column in, numpy only) ------
    def add_hashed(self, h1: np.ndarray) -> None:
        if len(h1) == 0:
            return
        pos = self._positions(h1).ravel()
        # bitwise_or.at: two positions may land in the same 64-bit word —
        # fancy-indexed |= would silently drop one
        np.bitwise_or.at(
            self.bits,
            pos >> np.uint64(6),
            np.uint64(1) << (pos & np.uint64(63)),
        )

    def contains_hashed(self, h1: np.ndarray) -> np.ndarray:
        pos = self._positions(h1)
        words = self.bits[pos >> np.uint64(6)]
        mask = np.uint64(1) << (pos & np.uint64(63))
        return (words & mask != 0).all(axis=1)

    # -- string API (tests / simulator; hashes via the pinned Python twin) --
    def add_many(self, urls) -> None:
        self.add_hashed(hash_urls(urls))

    def contains_many(self, urls) -> np.ndarray:
        return self.contains_hashed(hash_urls(urls))

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
