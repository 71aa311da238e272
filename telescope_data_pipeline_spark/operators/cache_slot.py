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
    """One owned cache per slot; owning a new DF evicts the previous."""

    def __init__(self) -> None:
        self._last: DataFrame | None = None

    def own(self, df: DataFrame) -> DataFrame:
        df = df.cache()
        if self._last is not None:
            self._last.unpersist(blocking=False)
        self._last = df
        return df
