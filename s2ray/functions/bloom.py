"""Vectorized Bloom filter over uint64 keys, SQL-mirrorable by construction.

The scale path for membership probes whose build side is too big to
broadcast as a sorted array: at 10 bits/key the filter is ~6x smaller
than the int64 array `decontaminate` ships, with zero false NEGATIVES
(every true member always probes positive), so a Bloom-backed
decontamination pass never leaks a contaminated document.

Hashing is double hashing (Kirsch-Mitzenmacher): position_i(x) =
(h1(x) + i*h2(x)) mod m with h1/h2 splitmix-style multiplicative mixes
mod 2^64 and m a power of two — every step is exact in DuckDB HUGEINT
arithmetic (see :func:`bloom_position_sql`), so the whole filter,
including its false positives, is reproducible in SQL and the operator
can sit under the bit-exact oracle gate.
"""

from __future__ import annotations

import numpy as np

_MIX1 = 0x9E3779B97F4A7C15   # splitmix64 / Fibonacci multiplier
_MIX2 = 0xC2B2AE3D27D4EB4F   # xxhash64 prime 2 (odd)
_SHIFT = 33                  # keep the well-mixed high product bits


def bloom_positions(keys: np.ndarray, n_hashes: int,
                    m_bits: int) -> np.ndarray:
    """(N, n_hashes) int64 bit positions in [0, m_bits).

    ``m_bits`` must be a power of two: the numpy path reduces the
    uint64-wrapped (h1 + i*h2) with ``& (m-1)``, which equals the exact
    integer ``(h1 + i*h2) mod m`` iff m divides 2^64 — the property the
    HUGEINT SQL mirror relies on.
    """
    assert m_bits & (m_bits - 1) == 0, "m_bits must be a power of two"
    k = np.asarray(keys).astype(np.uint64)
    # >> _SHIFT keeps the WELL-MIXED high bits of the multiplicative hash
    # (bit i of k*MIX depends only on bits <= i of k, so the raw low bits
    # are barely mixed — masking them directly measured a 30x worse FP
    # rate); the shifted values are < 2^31, so (h1 + i*h2) never wraps
    # and the SQL twin needs no mod-2^64 reduction at all
    h1 = (k * np.uint64(_MIX1)) >> np.uint64(_SHIFT)
    h2 = ((k * np.uint64(_MIX2)) >> np.uint64(_SHIFT)) | np.uint64(1)
    i = np.arange(n_hashes, dtype=np.uint64)
    pos = (h1[:, None] + i[None, :] * h2[:, None]) & np.uint64(m_bits - 1)
    return pos.astype(np.int64)


def bloom_build(keys: np.ndarray, m_bits: int, n_hashes: int) -> np.ndarray:
    """(m_bits/64,) uint64 word array with all key positions set.

    Fully vectorized scatter-OR: unique positions -> per-word run OR via
    bitwise_or.reduceat (no per-key python, no unbuffered ufunc.at).
    """
    words = np.zeros(m_bits >> 6, dtype=np.uint64)
    if len(keys) == 0:
        return words
    pos = np.unique(bloom_positions(keys, n_hashes, m_bits).reshape(-1))
    widx = pos >> 6
    bits = np.uint64(1) << (pos & 63).astype(np.uint64)
    starts = np.concatenate([[0], np.flatnonzero(widx[1:] != widx[:-1]) + 1])
    words[widx[starts]] = np.bitwise_or.reduceat(bits, starts)
    return words


def bloom_merge(filters) -> np.ndarray:
    """OR-merge partial filters (associative/commutative — per-batch
    partials can be built independently and tree-merged)."""
    out = None
    for w in filters:
        out = w.copy() if out is None else np.bitwise_or(out, w, out=out)
    return out


def bloom_contains(words: np.ndarray, keys: np.ndarray, n_hashes: int,
                   m_bits: int) -> np.ndarray:
    """(N,) bool: all n_hashes bits set (no false negatives)."""
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    pos = bloom_positions(keys, n_hashes, m_bits)
    hit = (words[pos >> 6] >> (pos & 63).astype(np.uint64)) & np.uint64(1)
    return hit.all(axis=1)


def _mulmix_sql(expr: str, mult: int) -> str:
    """``uint64(expr) * mult mod 2^64`` in DuckDB HUGEINT (split 32-bit
    modular multiply; same construction as sampling._mulmix_sql)."""
    m = 1 << 64
    mh, ml = mult >> 32, mult & 0xFFFFFFFF
    u = f"(((CAST({expr} AS HUGEINT) % {m}) + {m}) % {m})"
    return f"(((({u} * {mh}) % {1 << 32}) * {1 << 32} + {u} * {ml}) % {m})"


def bloom_position_sql(key_expr: str, i_expr: str, m_bits: int) -> str:
    """The exact SQL twin of :func:`bloom_positions` for one (key, i):
    ``((h1 >> SHIFT) + i*((h2 >> SHIFT) | 1)) % m`` — the shifted values
    are < 2^31, so the HUGEINT arithmetic is exact with no wrap, and
    % m equals the numpy & (m-1) because both operands are nonnegative
    and m is a power of two."""
    sh = 1 << _SHIFT
    h1 = f"({_mulmix_sql(key_expr, _MIX1)} // {sh})"
    h2m = f"({_mulmix_sql(key_expr, _MIX2)} // {sh})"
    h2 = f"({h2m} + 1 - ({h2m} % 2))"   # | 1 on an even/odd split
    return (f"CAST(({h1} + CAST({i_expr} AS HUGEINT) * {h2}) % {m_bits} "
            f"AS BIGINT)")
