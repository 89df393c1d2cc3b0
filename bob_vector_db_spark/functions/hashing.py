"""Deterministic, engine-portable hashing (SURVEY.md §2.8 F3/F4, §2.10 X3).

The reference generates uuid4 ids when the caller omits them
(qdrant_embedder.py:115-117).  uuid4 is untestable against an oracle, so the
tested id path is content hashing (FIXTURES.md §3): ``sha2``/``md5`` for exact
dedup ids, and a polynomial rolling hash for token-level hashing (MinHash,
SimHash, the deterministic hash embedder).

The polynomial hash is defined over the character codes of a token:

    h_0 = 0;  h_i = (h_{i-1} * 31 + ascii(c_i)) mod 1_000_003

It is pure integer arithmetic, so Spark and DuckDB produce bit-identical
values — that is what makes the whole dedup/embedding family oracle-checkable.
All arithmetic stays in JVM codegen (``transform``/``aggregate`` over
``sequence``), never in Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

POLY_MOD = 1_000_003  # prime; keeps (h*31 + 127) far from int64 overflow
POLY_BASE = 31

# (a, b) pairs for the MinHash permutation family h_i(x) = (a_i*x + b_i) mod P.
# P > POLY_MOD and prime; a_i < P so a_i * x < 2^62 — no int64 overflow.
MINHASH_PRIME = 2_147_483_647  # 2^31 - 1 (Mersenne)


def char_codes(token: Column) -> Column:
    """ARRAY<STRING> of the characters of ``token`` (split on '')."""
    return F.split(token, "")


def poly_hash(token: Column, mod: int = POLY_MOD) -> Column:
    """Polynomial rolling hash of a string column → BIGINT in [0, mod).

    Single-level fold over ``split(token, '')`` — Spark's higher-order
    functions are interpreted (not codegen'd), so one flat lambda beats the
    nested sequence/substr form ~4×.  Callers hashing MANY strings per row
    should explode to rows first and hash there, keeping the per-row lambda
    count constant (see operators.dedup / operators.embed).
    """
    return F.aggregate(
        char_codes(token),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * POLY_BASE + F.ascii(c)) % F.lit(mod),
    )


def minhash_perm(h: Column, a: int, b: int) -> Column:
    """One universal-hash permutation (a*h + b) mod MINHASH_PRIME."""
    return (h * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME)


def minhash_params(n: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) parameter list shared with the oracle SQL.

    A small LCG (public-domain constants from Numerical Recipes) — NOT
    Python's ``random`` — so the exact ints can be inlined into both the
    Spark plan and the DuckDB oracle text.
    """
    params, state = [], seed
    for _ in range(n):
        state = (state * 1664525 + 1013904223) % (2**32)
        a = state % (MINHASH_PRIME - 1) + 1
        state = (state * 1664525 + 1013904223) % (2**32)
        b = state % MINHASH_PRIME
        params.append((a, b))
    return params


def content_id(*cols: Column) -> Column:
    """Deterministic record id: sha2 over the concatenated content columns.

    Replaces the reference's uuid4 default (qdrant_embedder.py:115-117) on
    the oracle-tested path; F.uuid() stays available for production ingest.
    """
    return F.sha2(F.concat_ws("\x1f", *cols), 256)
