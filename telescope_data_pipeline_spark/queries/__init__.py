"""The judged operator inventory.

Each module registers queries with the :mod:`registry` decorator; a query is
a named (Spark callable, optional DuckDB oracle SQL) pair. ``__spark_entry__``
and the test suite both read from this registry, so the driver contract and
the local tests can never drift apart.
"""

from .registry import Query, all_queries, get, query  # noqa: F401


def load_all() -> None:
    """Import every query module so its registrations run."""
    from . import (  # noqa: F401
        aggregates,
        analysis,
        assurance,
        diagnostics,
        domain,
        evaluation,
        flagship,
        inference,
        insights,
        joins,
        llm,
        metrics,
        mining,
        monitoring,
        profiling,
        relational,
        retrieval,
        scalars,
        science,
        setops,
        sort_limit,
        streaming_batch,
        windows,
    )
