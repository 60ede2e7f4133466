"""Driver-side twin of Spark's ``xxhash64`` expression (XXH64, seed 42).

Why: the interactive query probe (operators/index._interactive_trip) maps
query terms to term_ids. Evaluating that via Catalyst — even as a folded
LocalRelation plan — costs one parse+analyze+fold round trip per query
(~40-60 ms of pure driver latency, the dominant share of the all-OOV query
floor). A driver-side hash lets the probe run in microseconds with zero
Catalyst work.

Exactness: Spark's ``XxHash64`` expression applies the reference XXH64
algorithm (xxHash by Yann Collet, BSD — Spark's XXH64Suite pins it against
the reference vectors) over the string's UTF-8 bytes with seed 42. This is
that algorithm, straight from the public spec. test_xxh64.py fuzzes it
against ``F.xxhash64`` over unicode/ascii/empty/long strings — any
divergence fails the build rather than mis-routing a query term.

Pure Python on purpose: probe inputs are a handful of short terms per
query (~5 µs each here); no native dependency is worth that.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """Unsigned XXH64 of ``data``. Spark's default seed is 42."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        for i in range(0, n - 31, 32):
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
        i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h = (_rotl(h ^ _round(0, int.from_bytes(data[i : i + 8], "little")), 27)
             * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h = (_rotl(h ^ (int.from_bytes(data[i : i + 4], "little") * _P1) & _M, 23)
             * _P2 + _P3) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ (data[i] * _P5) & _M, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64_str(s: str) -> int:
    """Signed-int64 twin of ``F.xxhash64(string_col)`` (seed 42)."""
    h = xxh64(s.encode("utf-8"), 42)
    return h - (1 << 64) if h >= (1 << 63) else h
