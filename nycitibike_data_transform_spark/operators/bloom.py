"""Bloom-filter membership prefilter — pure Column/aggregate
construction (no UDFs, no driver-side hashing of data rows).

Why it exists at 100 TB (DEPLOY.md's span_dedup / decontaminate
cuts): an exact semi-join against a keyed set shuffles or broadcasts
the full probe side. A Bloom filter of the set is kilobytes-to-
megabytes, has NO FALSE NEGATIVES, and so is a LOSSLESS prefilter in
front of any exact join: rows that fail the filter provably have no
match and never enter the shuffle; the small surviving fraction
(true matches + FPR·n) proceeds to the exact join unchanged. The
final result is bit-identical to the unfiltered plan — only the
shuffle volume changes.

Construction: each key row explodes to k bit positions
(double-hashing h1 + i·h2, the standard Kirsch–Mitzenmacher scheme,
over xxhash64 — JVM-side), positions group into 64-bit words, and
``bit_or`` folds each word's set bits. Only the bounded final bitset
reaches the driver (m bits / 8 bytes — e.g. 2 MiB for m=2^24).

Plan representation (the part that matters for compile time): the
bitset re-enters plans as ONE HEX-STRING LITERAL probed with
substring + conv per hash. A first cut used an array-of-longs
literal; a 5000-element ``CreateArray`` is an expression tree with
5000 children that whole-stage codegen must emit per reference —
measured 9 s of compile on the sf0.1 decontamination sweep entry.
A string literal is a single shared UTF8String constant regardless
of size; the per-row work is k nibble lookups.

Sizing: FPR ≈ (1 - e^(-k·n/m))^k; with m = 16·n bits and k = 7 the
rate is ~0.8%. Pick ``m_bits`` ≥ 16× the distinct key count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(col: Column, m_bits: int, k: int) -> list[Column]:
    """k bit-position Columns for a key (Kirsch–Mitzenmacher double
    hashing: pos_i = (h1 + i·h2) mod m, h2 forced odd so the probe
    sequence cycles the table)."""
    # reduce mod m BEFORE combining: raw xxhash64 values near
    # Long.MAX overflow the ANSI multiply; reduced values keep every
    # intermediate below k·m « 2^63
    h1 = F.pmod(F.xxhash64(col), F.lit(m_bits))
    h2 = F.pmod(F.xxhash64(col, F.lit(0x9E3779B9)), F.lit(m_bits)).bitwiseOR(
        F.lit(1)
    )
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k)]


def bloom_build(
    df: DataFrame,
    col: str,
    m_bits: int = 1 << 20,
    k: int = 7,
) -> str:
    """Build the filter over the DISTINCT values of ``df[col]`` and
    return it as a hex string of ``m_bits/4`` nibbles (nibble ``n``
    holds bits ``4n..4n+3``, LSB-first) — the single-constant form
    ``bloom_might_contain`` consumes. The only driver transfer is the
    bounded final bitset."""
    if m_bits % 64 != 0:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    n_words = m_bits // 64
    words = (
        df.select(F.col(col).alias("__key"))
        .filter(F.col("__key").isNotNull())
        .distinct()
        .select(
            F.explode(F.array(*_positions(F.col("__key"), m_bits, k))).alias("__pos")
        )
        .select(
            (F.col("__pos") / 64).cast("long").alias("__word"),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                F.pmod(F.col("__pos"), F.lit(64)).cast("int"),
            ).alias("__bit"),
        )
        .groupBy("__word")
        .agg(F.bit_or("__bit").alias("__bits"))
        .collect()
    )
    dense = [0] * n_words
    for r in words:
        dense[r["__word"]] = r["__bits"] & ((1 << 64) - 1)  # to unsigned
    nibbles = []
    for w in dense:
        for j in range(16):  # 16 nibbles per 64-bit word, LSB-first
            nibbles.append(format((w >> (4 * j)) & 0xF, "x"))
    return "".join(nibbles)


def bloom_might_contain(bloom: str, col: Column, k: int = 7) -> Column:
    """Membership test Column against a ``bloom_build`` hex bitset.
    TRUE may be a false positive (bounded by the sizing FPR); FALSE is
    definitive — which is what makes ``df.filter(...)`` in front of an
    exact join lossless. NULL keys test NULL (excluded by filter(),
    matching SQL semantics). Per hash: one substring into the shared
    string constant + one hex-digit conv + one bit test."""
    m_bits = len(bloom) * 4
    lit = F.lit(bloom)
    tests = []
    for pos in _positions(col, m_bits, k):
        nibble = F.conv(
            F.call_function("substring", lit, (pos / 4).cast("int") + 1, F.lit(1)),
            16,
            10,
        ).cast("int")
        bit = F.call_function(
            "shiftleft", F.lit(1), F.pmod(pos, F.lit(4)).cast("int")
        )
        tests.append(nibble.bitwiseAND(bit) != 0)
    out = tests[0]
    for t in tests[1:]:
        out = out & t
    return out
