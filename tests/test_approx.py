"""Approximate aggregates stay within their advertised error of the
exact forms — the accuracy contract behind the 100 TB swaps."""

from __future__ import annotations

from pyspark.sql import functions as F

from telescope_data_pipeline_spark.queries import get
from telescope_data_pipeline_spark.sources import load_table

SF = "/root/testdata/sf0.01"


def test_approx_aggregates_within_error(spark):
    approx = {r.l_returnflag: r for r in get("q_agg_approx").fn(spark, SF).collect()}
    exact = {r.l_returnflag: r for r in (
        load_table(spark, SF, "lineitem").groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("orders"),
             F.median("l_extendedprice").alias("med"))
    ).collect()}
    for k, e in exact.items():
        a = approx[k]
        assert abs(a.approx_orders - e.orders) / e.orders < 0.05
        assert abs(a.approx_median - e.med) / e.med < 0.01
        assert a.approx_q1 <= a.approx_median <= a.approx_q3


def test_stratified_sample_deterministic_and_proportional(spark):
    r1 = {r.lang: r.n_sampled for r in get("q_sample_stratified").fn(spark, SF).collect()}
    r2 = {r.lang: r.n_sampled for r in get("q_sample_stratified").fn(spark, SF).collect()}
    assert r1 == r2  # seeded: stable across runs
    totals = {r.lang: r.n for r in (
        load_table(spark, SF, "documents").groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))).collect()}
    # en heavily kept, zh heavily cut (Bernoulli sampling: loose bounds)
    assert r1["en"] / totals["en"] > 0.75
    assert r1["zh"] / totals["zh"] < 0.45


class TestBloom:
    """Bloom membership index: no false negatives ever; FPR within the
    textbook bound; both probe forms agree."""

    def _digests(self, spark):
        from telescope_data_pipeline_spark.sources import load_table
        from pyspark.sql import functions as F

        d = load_table(spark, "/root/testdata/sf0.01", "documents")
        return d.select("doc_id", F.md5("text").alias("dg"))

    def test_no_false_negatives(self, spark):
        from telescope_data_pipeline_spark.operators.bloom import (
            bloom_build,
            bloom_probe_literal,
        )

        dg = self._digests(spark)
        members = dg.filter("doc_id % 2 = 0")
        packed = bloom_build(members, "dg", m_bits=1 << 12, k=4)
        probed = bloom_probe_literal(members, "dg", packed, k=4)
        assert probed.filter("NOT might_contain").count() == 0

    def test_fpr_within_bound(self, spark):
        import math

        from telescope_data_pipeline_spark.operators.bloom import (
            bloom_build,
            bloom_probe_literal,
        )

        dg = self._digests(spark)
        members = dg.filter("doc_id % 2 = 0")
        others = dg.filter("doc_id % 2 = 1")
        m, k = 1 << 12, 4
        n = members.count()
        packed = bloom_build(members, "dg", m_bits=m, k=k)
        fp = (bloom_probe_literal(others, "dg", packed, k=k)
              .filter("might_contain").count())
        fpr = fp / others.count()
        theory = (1 - math.exp(-k * n / m)) ** k
        assert fpr <= 3 * theory + 0.02, (fpr, theory)

    def test_probe_forms_agree(self, spark):
        from telescope_data_pipeline_spark.operators.bloom import (
            bloom_build,
            bloom_probe_join,
            bloom_probe_literal,
            bloom_words_df,
        )

        dg = self._digests(spark)
        members = dg.filter("doc_id % 3 = 0")
        m, k = 1 << 12, 5
        packed = bloom_build(members, "dg", m_bits=m, k=k)
        words = bloom_words_df(members, "dg", m_bits=m, k=k)
        lit = {(r.doc_id, r.might_contain) for r in
               bloom_probe_literal(dg, "dg", packed, k=k).collect()}
        jn = {(r.doc_id, r.might_contain) for r in
              bloom_probe_join(dg, "dg", words, m_bits=m, k=k).collect()}
        assert lit == jn

    def test_rejects_unaligned_m(self, spark):
        import pytest

        from telescope_data_pipeline_spark.operators.bloom import (
            bloom_build,
            bloom_words_df,
        )

        dg = self._digests(spark)
        with pytest.raises(ValueError):
            bloom_build(dg, "dg", m_bits=100)
        with pytest.raises(ValueError):
            bloom_words_df(dg, "dg", m_bits=100)


# ---------------------------------------------------------------------------
# Two-pass exact median (operators/median2pass.py)
# ---------------------------------------------------------------------------

def test_two_pass_median_matches_sort_based(spark):
    from pyspark.sql import functions as F

    from telescope_data_pipeline_spark.operators.median2pass import (
        exact_median_two_pass,
    )
    from telescope_data_pipeline_spark.sources import load_table

    e = load_table(spark, "/root/testdata/sf0.01", "events")
    got = exact_median_two_pass(e, "value")
    want = e.agg(F.percentile("value", F.lit(0.5))).first()[0]
    assert got == want  # exact, not approximately


def test_two_pass_median_odd_even_and_constant(spark):
    from telescope_data_pipeline_spark.operators.median2pass import (
        exact_median_two_pass,
    )

    odd = spark.createDataFrame([(v,) for v in [5.0, 1.0, 9.0]], "v double")
    assert exact_median_two_pass(odd, "v") == 5.0
    even = spark.createDataFrame([(v,) for v in [4.0, 1.0, 9.0, 6.0]], "v double")
    assert exact_median_two_pass(even, "v") == 5.0
    const = spark.createDataFrame([(7.5,)] * 10, "v double")
    assert exact_median_two_pass(const, "v") == 7.5  # lo==hi short-circuit


def test_two_pass_median_recursion_path_exact(spark, monkeypatch):
    """Force the refine recursion (tiny _REFINE_CAP) on a skewed
    distribution with values landing EXACTLY on bucket boundaries —
    the ulp-sensitive case: the carried ranks must stay consistent
    with the narrowed population (cumulative bucket predicate, not a
    recomputed float range test)."""
    from pyspark.sql import functions as F

    from telescope_data_pipeline_spark.operators import median2pass

    monkeypatch.setattr(median2pass, "_REFINE_CAP", 8)
    # heavy concentration near 0 plus a long tail; many values are
    # exact multiples of the first-level bucket width (lo=0, hi=1024,
    # buckets=16 -> width=64)
    vals = [float(i % 7) * 0.125 for i in range(400)]
    vals += [64.0, 128.0, 192.0, 256.0, 1024.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = median2pass.exact_median_two_pass(df, "v", buckets=16,
                                            max_depth=12)
    want = df.agg(F.percentile("v", F.lit(0.5))).first()[0]
    assert got == want

    # and a boundary-tie layout: all mass at two adjacent bucket edges
    vals2 = [64.0] * 300 + [128.0] * 300 + [0.0, 1024.0]
    df2 = spark.createDataFrame([(v,) for v in vals2], "v double")
    got2 = median2pass.exact_median_two_pass(df2, "v", buckets=16,
                                             max_depth=12)
    want2 = df2.agg(F.percentile("v", F.lit(0.5))).first()[0]
    assert got2 == want2


# ---------------------------------------------------------------------------
# Heavy hitters (operators/heavy_hitters.py)
# ---------------------------------------------------------------------------

def test_heavy_hitters_exact_vs_bruteforce(spark):
    """The MG-candidates + exact-rescue result must equal the direct
    GROUP BY/HAVING answer on a skewed stream, for several k — the
    sketch may only prune, never change the answer."""
    from pyspark.sql import functions as F

    from telescope_data_pipeline_spark.operators.heavy_hitters import (
        heavy_hitters_exact,
    )

    # skewed: key i appears 2^(10-i) times, plus a long tail of singletons
    rows = [(f"k{i}",) for i in range(10) for _ in range(2 ** (10 - i))]
    rows += [(f"tail{j}",) for j in range(500)]
    df = spark.createDataFrame(rows, "w string").repartition(16)
    total = len(rows)
    for k in (3, 8, 40):
        got = {(r.w, r.c) for r in heavy_hitters_exact(df, "w", k).collect()}
        want = {(r.w, r.c) for r in
                df.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
                .filter(F.col("c") * k > total).collect()}
        assert got == want, (k, got ^ want)


def test_heavy_hitters_null_and_empty(spark):
    from telescope_data_pipeline_spark.operators.heavy_hitters import (
        heavy_hitters_exact,
    )

    df = spark.createDataFrame([("a",), (None,), ("a",), (None,)], "w string")
    got = {(r.w, r.c) for r in heavy_hitters_exact(df, "w", 3).collect()}
    assert got == {("a", 2)}  # NULLs ignored; 2*3 > 2 holds
    empty = spark.createDataFrame([], "w string")
    assert heavy_hitters_exact(empty, "w", 5).count() == 0
