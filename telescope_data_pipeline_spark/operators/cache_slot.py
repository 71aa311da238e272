"""Single-slot cache ownership for operators that must cache a mid-plan
DataFrame (two downstream consumers, or a partition-id assignment that
must be identical across jobs) but return a LAZY result — the operator
itself can never know when its caller has materialized the output, so
it cannot unpersist eagerly without risking recompute of the very thing
it cached.

The bounded alternative: each operator module owns ONE slot. Owning a
new DataFrame unpersists the previously-owned one, so executor storage
is bounded to a single cached table per operator family regardless of
how many times the operator is invoked in a session (the pattern
simhash_near_duplicates introduced; factored here so prefix-sum and
packing reuse it instead of leaking — round-3 ADVICE items).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["CacheSlot"]


class CacheSlot:
    """One owned cache per slot; owning a new DF evicts the previous.

    Eviction must NOT fire when the new DataFrame has the same logical
    plan as the previous one: Spark's CacheManager keys entries by plan
    equivalence, so ``cache()`` on an identical plan reuses the existing
    entry and unpersisting the "previous" DataFrame would drop the entry
    the new caller is about to depend on. The symptom is brutal — the
    downstream self-join loses its InMemoryTableScan legs, the operator's
    expensive expression (e.g. the interpreted SimHash fold) is inlined
    and re-evaluated per consumer row, and a repeat invocation runs ~60x
    slower than the first. Plan-equivalent re-ownership keeps the one
    shared entry; storage stays bounded either way.
    """

    def __init__(self) -> None:
        self._last: DataFrame | None = None

    @staticmethod
    def _same_plan(a: DataFrame, b: DataFrame) -> bool:
        try:
            return bool(a._jdf.queryExecution().analyzed().sameResult(
                b._jdf.queryExecution().analyzed()))
        except Exception:  # py4j hiccough: err on the keep-cache side
            return True

    def own(self, df: DataFrame) -> DataFrame:
        prev = self._last
        df = df.cache()
        if prev is not None and not self._same_plan(prev, df):
            prev.unpersist(blocking=False)
        self._last = df
        return df
