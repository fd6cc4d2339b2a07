"""Referential pseudonymization: deterministic keyed masking.

The GDPR-pipeline complement to hard erasure (operators/upsert.py::
erase_keys_parquet) and span-level PII scrubbing (queries/corpus_ops):
replace identifying keys with salted one-way pseudonyms such that

- the SAME key always maps to the SAME pseudonym (within a salt), so
  joins, group-bys, and deduplication still work across every table
  pseudonymized with that salt — referential integrity survives;
- different salts produce unlinkable releases (the salt is the secret:
  rotating it breaks linkage between two published datasets);
- the mapping is one-way (md5 preimage resistance is ample against
  casual re-identification; for an adversarial threat model swap in a
  keyed HMAC at this seam — the plumbing is identical).

Everything is a codegen'd column expression (md5 over salt||key) — no
shuffle, no UDF, linear scan cost — and md5 hex is byte-identical in
Spark and DuckDB, so pseudonym VALUES themselves are differentially
verifiable, not just their cardinalities.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def pseudonym(col: Column | str, salt: str) -> Column:
    """Salted one-way pseudonym of a key column (32-hex md5)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.concat(F.lit(salt), F.lit("|"), c.cast("string")))


def pseudonymize(df: DataFrame, cols: list[str], salt: str) -> DataFrame:
    """Replace each named key column with its salted pseudonym (same
    column name, string type). Null keys stay null (no pseudonym can
    be distinguished from another null's — and md5(null) is null in
    both engines anyway)."""
    out = df
    for c in cols:
        out = out.withColumn(c, pseudonym(c, salt))
    return out
