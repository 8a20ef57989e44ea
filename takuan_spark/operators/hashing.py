"""Deterministic, engine-portable hash families.

Spark's native ``xxhash64`` is fast but engine-internal: no external SQL
engine can reproduce it, so sketches built on it can never be
oracle-checked. Every family here is **md5-derived** — md5 is md5
everywhere — with the exact same integer derivation expressible in both
Spark (``conv(substring(md5(x), 1, k), 16, 10)``) and ANSI-ish SQL
(``CAST(concat('0x', substr(md5(x), 1, k)) AS BIGINT)``), so MinHash,
SimHash and winnowing become hash-match verifiable against DuckDB
(VERDICT r1 §Next-round #1; the pattern was proven by
``ns_winnow_fingerprint``).

The MinHash family is the classic universal family
``h_i(x) = (a_i * base(x) + b_i) mod p`` over a Mersenne prime
``p = 2^31 - 1``: one md5 per input, then 64 affine maps that stay in
whole-stage codegen. Keeping ``base < 2^32`` and ``a_i < p`` bounds the
product under ``2^62`` — no signed-64 overflow in either engine.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mersenne prime 2^31 - 1: modulus of the affine MinHash family.
MERSENNE31 = 2_147_483_647


def md5_int(col: Column | str, *, hex_chars: int = 8) -> Column:
    """First ``hex_chars`` hex digits of md5 as a non-negative bigint
    (8 chars → 32 bits, 15 chars → 60 bits; keep ≤ 15 so the value
    always fits a *signed* 64-bit int in every engine)."""
    if hex_chars > 15:
        raise ValueError("hex_chars > 15 can overflow signed 64-bit ints")
    return F.conv(F.substring(F.md5(col), 1, hex_chars), 16, 10).cast("bigint")


def sql_md5_int(expr: str, *, hex_chars: int = 8) -> str:
    """The DuckDB spelling of :func:`md5_int` over SQL expression
    ``expr`` — bit-identical by construction."""
    return (
        f"CAST(concat('0x', substr(md5({expr}), 1, {hex_chars})) AS BIGINT)"
    )


def md5_lane_int(
    col: Column | str, lane: int, *, hex_chars: int = 8
) -> Column:
    """Lane ``lane`` of one md5 digest: hex chars
    ``[lane*hex_chars, (lane+1)*hex_chars)`` as a non-negative bigint.
    Disjoint substrings of a single digest give ``32 // hex_chars``
    independent-enough hash rows for the price of ONE md5 — the CMS
    depth dimension needs d hashes per item, and d digests per item
    made the digest the dominant pre-shuffle cost (r5 stage probe:
    9.5 s of 9.8 s). Codegen's subexpression elimination computes the
    shared ``md5(col)`` once across lanes."""
    if (lane + 1) * hex_chars > 32:
        raise ValueError("lane slice exceeds the 32 hex chars of md5")
    if hex_chars > 15:
        raise ValueError("hex_chars > 15 can overflow signed 64-bit ints")
    return F.conv(
        F.substring(F.md5(col), 1 + lane * hex_chars, hex_chars), 16, 10
    ).cast("bigint")


def sql_md5_lane_int(expr: str, lane_expr: str, *, hex_chars: int = 8) -> str:
    """DuckDB spelling of :func:`md5_lane_int`; ``lane_expr`` may be any
    SQL integer expression (e.g. the unnested row index). ``expr`` is
    CAST to VARCHAR first — a no-op for string columns, and the mirror
    of the Spark side's ``cast("string")`` for numeric value columns
    (both engines render integers identically, so the digests agree)."""
    return (
        f"CAST(concat('0x', substr(md5(CAST({expr} AS VARCHAR)), "
        f"1 + ({lane_expr}) * {hex_chars}, {hex_chars})) AS BIGINT)"
    )


def _det_int(tag: str, lo: int, hi: int) -> int:
    """Deterministic integer in [lo, hi) derived from md5(tag) — the
    seed material for affine coefficients; no RNG state involved."""
    return lo + int(hashlib.md5(tag.encode()).hexdigest()[:16], 16) % (hi - lo)


def affine_params(num_hashes: int, *, seed: int = 42) -> list[tuple[int, int]]:
    """``num_hashes`` (a, b) pairs for the universal family
    ``(a*x + b) mod MERSENNE31``, a ∈ [1, p), b ∈ [0, p). Pure function
    of (seed, i): the same constants are embedded as literals in the
    Spark plan and in the oracle SQL."""
    p = MERSENNE31
    return [
        (
            _det_int(f"mh-a:{seed}:{i}", 1, p),
            _det_int(f"mh-b:{seed}:{i}", 0, p),
        )
        for i in range(num_hashes)
    ]


def affine(base: Column, a: int, b: int) -> Column:
    """One member of the family, as a codegen'd Spark expression. ``base``
    must already be reduced mod MERSENNE31."""
    return (F.lit(a) * base + F.lit(b)) % F.lit(MERSENNE31)


def sql_affine(base_expr: str, a: int, b: int) -> str:
    return f"(({a} * {base_expr} + {b}) % {MERSENNE31})"
