"""Corpus mixing at scale: hash-threshold selection.

Mixture schedules (en 50%, others 25%, ...) need a deterministic,
reproducible draw of a fixed fraction per group. The rank form —
``row_number() OVER (PARTITION BY lang ORDER BY md5(id))`` — is exact
but sorts EACH language in one partition: with ~5 languages that is 5
tasks carrying the whole corpus, the canonical skew trap at 100 TB
(queries/llm.py::q_mix_corpus keeps it as the oracle demo).

The scale form here drops the rank entirely and thresholds on the hash
VALUE: ``md5(id)`` is uniform over [0, 16^32), so keeping rows whose
digest is lexicographically below the 32-hex-digit encoding of
``frac * 16^32`` selects a ``frac`` share of each group in expectation,
with binomial concentration (at 100 TB per-group counts are billions;
relative error ~ 1/sqrt(n) is parts-per-million). Properties:

- **map-only**: one scan, one filter — no sort, no shuffle, no skew;
  the plan contains no Exchange at all;
- **deterministic & content-addressed**: the same document is selected
  in every engine, run, and backfill (no RNG state), and growing the
  corpus never deselects a previously selected doc;
- **engine-portable**: equal-length lowercase-hex strings compare
  lexicographically exactly as their numeric values, so the same
  predicate runs verbatim in any SQL engine (the DuckDB oracle uses the
  identical CASE/threshold expression — no integer conversion needed).

Fractions are per-group constants folded into a CASE chain (mixture
tables are tiny — a broadcast join would work but is pure overhead).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hash_fraction_threshold", "mix_by_hash"]


def hash_fraction_threshold(frac: float) -> str:
    """32-hex-digit threshold t such that P[md5(x) < t] == ``frac`` for
    uniform digests: the hex encoding of ``floor(frac * 16^32)``."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"fraction {frac!r} outside [0, 1]")
    return format(min(int(frac * 16**32), 16**32 - 1), "032x")


def mix_by_hash(df: DataFrame, id_col: str, group_col: str,
                fractions: dict[str, float],
                default_fraction: float = 0.0,
                digest_col: str = "digest") -> DataFrame:
    """Keep a deterministic ``fractions[group]`` share of each group's
    rows (``default_fraction`` for unlisted groups), selected by
    md5-digest threshold — no sort, no shuffle, no per-group skew.

    Returns the input rows (plus ``digest_col``) whose digest falls
    below the group's threshold; drop ``digest_col`` if not wanted.
    """
    digest = F.md5(F.col(id_col).cast("string"))
    cutoff: Column = F.lit(hash_fraction_threshold(default_fraction))
    for group, frac in sorted(fractions.items()):
        cutoff = F.when(F.col(group_col) == group,
                        F.lit(hash_fraction_threshold(frac))).otherwise(cutoff)
    return (df.withColumn(digest_col, digest)
            .filter(F.col(digest_col) < cutoff))
