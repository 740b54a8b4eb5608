"""Cuckoo-filter URL-seen segments — the north_star's alternative to Bloom.

Same segment API as frontier/bloom.BloomSegment (add_many / contains_many
/ to_bytes / from_bytes, plus the hashed-input hot-path variants) so
SeenStore can run on either backend (``SeenStore(filter_kind="cuckoo")``),
plus the one capability Bloom fundamentally lacks: ``delete_many``
(retract a url from the seen set — e.g. re-crawl scheduling / TTL'd page
expiry) without rebuilding.

Standard partial-key cuckoo hashing (Fan et al., "Cuckoo Filter:
Practically Better Than Bloom", CoNEXT 2014): 16-bit fingerprints, 4-slot
buckets, two candidate buckets i1 = h(url), i2 = i1 ^ h(fingerprint)
(involutive, so relocation needs only the stored fingerprint), bounded
eviction with a tiny overflow stash.

Hashing (round 3): the url hash arrives as the JVM-computed
``F.xxhash64(url)`` column (see frontier/bloom.py); fingerprint = low 16
bits, bucket index from a vectorized splitmix64 of the hash, and the
partner-bucket xor comes from ``_FP_MIX`` — a precomputed 65,536-entry
splitmix64 table indexed by fingerprint, so membership tests are pure
numpy over int arrays. Insertion keeps a per-item Python loop (cuckoo
eviction is inherently sequential), but all hashing is hoisted out.

Semantics notes for the crawl engine:
- No false negatives (as long as nothing is silently dropped — full
  buckets overflow to the stash, never to the floor), so Bloom-negative
  short-circuiting carries over unchanged.
- Placement is insertion-order dependent (eviction path), but CONTAINS
  answers are order-independent — false positives come only from
  fingerprint collisions — so cogroup batch-order nondeterminism cannot
  change crawl results (positives are exact-confirmed anyway).
- Serialized layout: uint32 n_buckets | uint32 stash_len | stash uint16s
  | table uint16s. Schema rows mark cuckoo segments with n_hashes = -1
  (bloom rows keep their real k), so mixed checkpoints stay readable.
"""

from __future__ import annotations

import struct

import numpy as np

from fraudcrawler_spark.frontier.bloom import hash_urls, splitmix64

CUCKOO_KIND_SENTINEL = -1  # n_hashes value marking a cuckoo row in SEG_SCHEMA
_SLOTS = 4
_MAX_KICKS = 500

# Partner-bucket xor per 16-bit fingerprint: one vectorized splitmix64 pass
# at import, then membership/insert/delete are table lookups (no hashlib).
_FP_MIX = splitmix64(np.arange(1 << 16, dtype=np.uint64))


def _next_pow2(n: int) -> int:
    return 1 << max(4, (int(n) - 1).bit_length())


class CuckooSegment:
    """Cuckoo filter over the urls of one hash partition."""

    n_hashes = CUCKOO_KIND_SENTINEL  # schema marker, not a parameter

    def __init__(self, capacity: int, table: np.ndarray | None = None,
                 stash: list[int] | None = None):
        self.capacity = max(int(capacity), 64)
        # 4-slot buckets sized for ≤0.75 load at `capacity` items — safely
        # under the ~0.95 threshold where 4-way cuckoo insertion degrades
        self.n_buckets = _next_pow2((self.capacity + 2) // 3)
        self._mask = self.n_buckets - 1
        if table is None:
            self.table = np.zeros((self.n_buckets, _SLOTS), dtype=np.uint16)
        else:
            self.table = table.reshape(self.n_buckets, _SLOTS).copy()
        self.stash: list[int] = list(stash or [])

    # -- hash column → (fingerprint, bucket pair) arrays ----------------------
    def _fpi(self, h1: np.ndarray):
        """Vectorized: uint64 hash column → (f uint16, i1 intp, i2 intp)."""
        f = (h1 & np.uint64(0xFFFF)).astype(np.uint16)
        f[f == 0] = 1  # 0 marks an empty slot
        i1 = (splitmix64(h1) & np.uint64(self._mask)).astype(np.intp)
        i2 = (i1 ^ (_FP_MIX[f] & np.uint64(self._mask)).astype(np.intp))
        return f, i1, i2

    def _try_place(self, f: int, i: int) -> bool:
        row = self.table[i]
        empty = np.nonzero(row == 0)[0]
        if len(empty):
            row[empty[0]] = f
            return True
        return False

    def _insert(self, f: int, i1: int, i2: int) -> None:
        if self._try_place(f, i1) or self._try_place(f, i2):
            return
        # bounded eviction, deterministic victim slot (kick count mod slots)
        i = i2
        for kick in range(_MAX_KICKS):
            slot = kick % _SLOTS
            f, self.table[i][slot] = int(self.table[i][slot]), f
            i = (i ^ int(_FP_MIX[f] & np.uint64(self._mask)))
            if self._try_place(f, i):
                return
        # stash overflow: never drop (no false negatives); stash is checked
        # by contains and serialized with the table
        self.stash.append(f)

    # -- hashed API: hot path (JVM xxhash64 column in) ------------------------
    def add_hashed(self, h1: np.ndarray) -> None:
        f, i1, i2 = self._fpi(h1)
        for k in range(len(f)):
            self._insert(int(f[k]), int(i1[k]), int(i2[k]))

    def contains_hashed(self, h1: np.ndarray) -> np.ndarray:
        if len(h1) == 0:
            return np.zeros(0, dtype=bool)
        f, i1, i2 = self._fpi(h1)
        fc = f[:, None]
        hit = (self.table[i1] == fc).any(axis=1) | (self.table[i2] == fc).any(axis=1)
        if self.stash:
            hit |= np.isin(f, np.asarray(self.stash, dtype=np.uint16))
        return hit

    def delete_hashed(self, h1: np.ndarray) -> np.ndarray:
        """Remove one fingerprint occurrence per url-hash; returns per-url
        whether something was deleted. The capability Bloom cannot offer."""
        out = np.zeros(len(h1), dtype=bool)
        f, i1, i2 = self._fpi(h1)
        for k in range(len(f)):
            fk = int(f[k])
            for i in (int(i1[k]), int(i2[k])):
                hits = np.nonzero(self.table[i] == fk)[0]
                if len(hits):
                    self.table[i][hits[0]] = 0
                    out[k] = True
                    break
            else:
                if fk in self.stash:
                    self.stash.remove(fk)
                    out[k] = True
        return out

    # -- string API (tests / simulator) ----------------------------------------
    def add_many(self, urls) -> None:
        self.add_hashed(hash_urls(urls))

    def contains_many(self, urls) -> np.ndarray:
        return self.contains_hashed(hash_urls(urls))

    def delete_many(self, urls) -> np.ndarray:
        return self.delete_hashed(hash_urls(urls))

    # -- serialization ---------------------------------------------------------
    def to_bytes(self) -> bytes:
        head = struct.pack("<II", self.n_buckets, len(self.stash))
        stash = np.asarray(self.stash, dtype=np.uint16).tobytes()
        return head + stash + self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, capacity: int) -> "CuckooSegment":
        n_buckets, n_stash = struct.unpack_from("<II", data, 0)
        off = 8
        stash = np.frombuffer(data, dtype=np.uint16, count=n_stash,
                              offset=off).tolist()
        off += 2 * n_stash
        table = np.frombuffer(data, dtype=np.uint16, offset=off).copy()
        seg = cls(capacity)
        if seg.n_buckets != n_buckets:
            # ValueError (not assert): must survive `python -O` — a silent
            # mismatch here leaves _mask inconsistent with the table and
            # produces false negatives → duplicate claims
            raise ValueError(
                f"capacity {capacity} implies {seg.n_buckets} buckets, "
                f"serialized segment has {n_buckets} — resume with the "
                "manifest's seen_capacity_per_part"
            )
        seg.table = table.reshape(n_buckets, _SLOTS)
        seg.stash = [int(s) for s in stash]
        return seg
