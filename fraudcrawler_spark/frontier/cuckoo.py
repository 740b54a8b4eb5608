"""Cuckoo-filter URL-seen segments — the north_star's alternative to Bloom.

Same segment API as frontier/bloom.BloomSegment (add_many / contains_many
/ to_bytes / from_bytes) so SeenStore can run on either backend
(``SeenStore(filter_kind="cuckoo")``), plus the one capability Bloom
fundamentally lacks: ``delete_many`` (retract a url from the seen set —
e.g. re-crawl scheduling / TTL'd page expiry) without rebuilding.

Standard partial-key cuckoo hashing (Fan et al., "Cuckoo Filter:
Practically Better Than Bloom", CoNEXT 2014): 16-bit fingerprints, 4-slot
buckets, two candidate buckets i1 = h(url), i2 = i1 ^ h(fingerprint)
(involutive, so relocation needs only the stored fingerprint), bounded
eviction with a tiny overflow stash.

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

import hashlib
import struct

import numpy as np

CUCKOO_KIND_SENTINEL = -1  # n_hashes value marking a cuckoo row in SEG_SCHEMA
_SLOTS = 4
_MAX_KICKS = 500


def _hash_pair(url: str) -> tuple[int, int]:
    d = hashlib.blake2b(url.encode("utf-8"), digest_size=16).digest()
    return int.from_bytes(d[:8], "little"), int.from_bytes(d[8:], "little")


def _fp_hash(f: int) -> int:
    # small deterministic fingerprint hash for the partner-bucket xor
    d = hashlib.blake2b(f.to_bytes(2, "little"), digest_size=8).digest()
    return int.from_bytes(d, "little")


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

    # -- key → (fingerprint, bucket pair) ------------------------------------
    def _fpi(self, url: str) -> tuple[int, int, int]:
        h1, h2 = _hash_pair(url)
        f = (h1 & 0xFFFF) or 1  # 0 marks an empty slot
        i1 = h2 & self._mask
        i2 = (i1 ^ _fp_hash(f)) & self._mask
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
            i = (i ^ _fp_hash(f)) & self._mask
            if self._try_place(f, i):
                return
        # stash overflow: never drop (no false negatives); stash is checked
        # by contains and serialized with the table
        self.stash.append(f)

    # -- BloomSegment-compatible API ------------------------------------------
    def add_many(self, urls) -> None:
        for u in urls:
            f, i1, i2 = self._fpi(u)
            self._insert(f, i1, i2)

    def contains_many(self, urls) -> np.ndarray:
        out = np.empty(len(urls), dtype=bool)
        stash = set(self.stash)
        for k, u in enumerate(urls):
            f, i1, i2 = self._fpi(u)
            out[k] = (
                bool((self.table[i1] == f).any())
                or bool((self.table[i2] == f).any())
                or f in stash
            )
        return out

    def delete_many(self, urls) -> np.ndarray:
        """Remove one fingerprint occurrence per url; returns per-url
        whether something was deleted. The capability Bloom cannot offer."""
        out = np.zeros(len(urls), dtype=bool)
        for k, u in enumerate(urls):
            f, i1, i2 = self._fpi(u)
            for i in (i1, i2):
                hits = np.nonzero(self.table[i] == f)[0]
                if len(hits):
                    self.table[i][hits[0]] = 0
                    out[k] = True
                    break
            else:
                if f in self.stash:
                    self.stash.remove(f)
                    out[k] = True
        return out

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
        assert seg.n_buckets == n_buckets, (
            f"capacity {capacity} implies {seg.n_buckets} buckets, "
            f"serialized segment has {n_buckets} — resume with the "
            "manifest's seen_capacity_per_part"
        )
        seg.table = table.reshape(n_buckets, _SLOTS)
        seg.stash = [int(s) for s in stash]
        return seg
