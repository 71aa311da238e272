"""Quality gates for the hash-seeded operators (no SQL oracle possible):
MinHash-LSH candidates vs brute-force Jaccard, ANN recall vs brute-force
cosine top-k."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from telescope_data_pipeline_spark.operators.dedup import (
    minhash_near_duplicates,
    shingle,
    simhash_near_duplicates,
)
from telescope_data_pipeline_spark.operators.similarity import ann_topk
from telescope_data_pipeline_spark.sources import load_table

SF = "/root/testdata/sf0.001"  # quality gates are scale-free; keep them fast


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents")


@pytest.fixture(scope="module")
def vecs(spark):
    return load_table(spark, SF, "embeddings")


def brute_force_jaccard_pairs(spark, docs, threshold):
    """All-pairs token-shingle Jaccard — the oracle MinHash approximates."""
    sh = shingle(docs, "doc_id", "text", n=3)
    a = sh.select(F.col("id").alias("id_a"), F.col("shingles").alias("sa"))
    b = sh.select(F.col("id").alias("id_b"), F.col("shingles").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    union = F.size("sa") + F.size("sb") - inter
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard", inter.cast("double") / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b")
    )


def test_minhash_finds_exact_duplicates(spark, docs):
    """Exact duplicates (jaccard=1.0) must ALWAYS be LSH candidates —
    identical shingle sets give identical signatures, which agree on
    every band. Inject copies so the ground truth is non-empty."""
    base = docs.limit(10)
    doubled = base.select("doc_id", "text").unionByName(
        base.select((F.col("doc_id") + 100000).alias("doc_id"), "text"))
    found = {(r.id_a, r.id_b) for r in
             minhash_near_duplicates(doubled, "doc_id", "text",
                                     threshold=0.99).collect()}
    expected = {(r.doc_id, r.doc_id + 100000) for r in base.collect()}
    assert expected <= found


def test_minhash_pairs_verified_jaccard(spark, docs):
    """Every returned pair's jaccard is real (>= threshold): the refine
    step uses exact set intersection, so no false positives survive."""
    out = minhash_near_duplicates(docs, "doc_id", "text", threshold=0.2)
    rows = out.collect()
    assert rows
    truth = {tuple(r) for r in
             brute_force_jaccard_pairs(spark, docs, 0.2).collect()}
    assert all((r.id_a, r.id_b) in truth for r in rows)


def test_simhash_self_consistency(spark, docs):
    """Identical texts → identical fingerprints → hamming 0 pairs found."""
    dup = docs.limit(5)
    doubled = dup.select(F.col("doc_id"), F.col("text")).unionByName(
        dup.select((F.col("doc_id") + 100000).alias("doc_id"), F.col("text")))
    pairs = simhash_near_duplicates(doubled, "doc_id", "text", max_hamming=0)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    expected = {(r.doc_id, r.doc_id + 100000) for r in dup.collect()}
    assert expected <= got


def test_simhash_banding_is_exact_at_radius(spark, docs):
    """max_hamming+1 chunks guarantee (pigeonhole) that every pair within
    the radius shares a chunk, and the popcount refine removes the rest —
    so the operator must EQUAL brute-force pairwise hamming, not
    approximate it. Radius 8 previously exceeded the 4-chunk guarantee."""
    from telescope_data_pipeline_spark.operators.dedup import (
        simhash64,
        simhash_fingerprints_jvm,
    )

    for radius, jvm in ((0, True), (8, True), (16, True), (8, False)):
        got = {(r.id_a, r.id_b) for r in
               simhash_near_duplicates(docs, "doc_id", "text",
                                       max_hamming=radius, jvm=jvm).collect()}
        if jvm:
            fps = simhash_fingerprints_jvm(docs, "doc_id", "text").collect()
        else:
            fps = docs.select(F.col("doc_id").alias("id"),
                              simhash64(F.col("text")).alias("fp")).collect()
        want = {(a.id, b.id)
                for i, a in enumerate(fps) for b in fps[i + 1:]
                if bin((a.fp ^ b.fp) & 0xFFFFFFFFFFFFFFFF).count("1") <= radius}
        want = {(min(p), max(p)) for p in want}
        assert got == want, \
            f"radius {radius} jvm={jvm}: got {len(got)} want {len(want)}"


def test_simhash_vectorized_matches_scalar():
    """The numpy-batched kernel is bit-for-bit the scalar FNV-1a SimHash
    construction — fingerprints must never drift between kernel versions."""
    import numpy as np
    import pandas as pd

    from telescope_data_pipeline_spark.operators.dedup import _simhash_batch

    def scalar_simhash(text):
        acc = np.zeros(64, dtype=np.int64)
        for tok in (text or "").split():
            h = np.uint64(14695981039346656037)
            for ch in tok.encode():
                h = np.uint64((int(h) ^ ch) * 1099511628211
                              & 0xFFFFFFFFFFFFFFFF)
            bits = np.unpackbits(
                np.frombuffer(np.uint64(h).tobytes(), dtype=np.uint8))
            acc += np.where(bits.astype(np.int64) > 0, 1, -1)
        fp = np.packbits((acc > 0).astype(np.uint8)).view(">u8")[0]
        return np.int64(np.uint64(fp).astype(np.int64))

    texts = ["", None, "one token two", "héllo wörld 漢字",
             " runs \t of\nwhitespace ", "a" * 200 + " b", "a b a b a"]
    got = _simhash_batch(pd.Series(texts))
    want = [scalar_simhash(t) for t in texts]
    assert got.tolist() == want


def test_ann_recall_vs_brute_force(spark, vecs):
    """Multi-table hyperplane LSH recall@5 against exact top-5. The
    corpus is near-orthogonal (max cos 0.51) — the hardest regime for
    LSH — so the gate is deliberately modest; the structural guarantees
    (no self-pairs, <=k per query, descending cosine) are strict."""
    queries = vecs.filter(F.col("vec_id") < 20)
    # 4-bit buckets x 8 tables: collision prob for cos~0.4 neighbors is
    # usable on this geometry; 8x4 (the production default) is tuned for
    # corpora with true near-duplicates (cos > 0.8).
    approx = ann_topk(queries, vecs, k=5, dim=64, n_bits=4, n_tables=8)
    rows = approx.collect()
    assert rows
    by_q: dict[int, list] = {}
    for r in rows:
        assert r.query_id != r.cand_id
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        assert len(rs) <= 5
        cosines = [r.cosine for r in sorted(rs, key=lambda r: r.rank)]
        assert cosines == sorted(cosines, reverse=True)

    # recall vs brute force
    from telescope_data_pipeline_spark.queries import get

    exact = get("q_sim_topk").fn(spark, SF).collect()
    truth = {(r.query_id, r.cand_id) for r in exact}
    found = {(r.query_id, r.cand_id) for r in rows}
    recall = len(truth & found) / len(truth)
    assert recall >= 0.5, f"ANN recall collapsed: {recall:.2f}"


def test_ivf_recall_and_structure(spark, vecs):
    """IVF ANN: structural guarantees strict; recall@5 vs exact top-5
    with nprobe=8 of 16 cells on the near-orthogonal corpus."""
    from telescope_data_pipeline_spark.operators.similarity import ivf_topk

    queries = vecs.filter(F.col("vec_id") < 20)
    rows = ivf_topk(queries, vecs, k=5, n_centroids=16, nprobe=8).collect()
    assert rows
    by_q: dict[int, list] = {}
    for r in rows:
        assert r.query_id != r.cand_id
        by_q.setdefault(r.query_id, []).append(r)
    for rs in by_q.values():
        assert len(rs) <= 5

    from telescope_data_pipeline_spark.queries import get

    truth = {(r.query_id, r.cand_id) for r in get("q_sim_topk").fn(spark, SF).collect()}
    found = {(r.query_id, r.cand_id) for r in rows}
    recall = len(truth & found) / len(truth)
    assert recall >= 0.4, f"IVF recall collapsed: {recall:.2f}"


def test_ivf_full_probe_is_exact(spark, vecs):
    """nprobe == n_centroids must reproduce the exact brute-force top-k."""
    from telescope_data_pipeline_spark.operators.similarity import ivf_topk
    from telescope_data_pipeline_spark.queries import get

    queries = vecs.filter(F.col("vec_id") < 20)
    got = {(r.query_id, r.cand_id, r.rank)
           for r in ivf_topk(queries, vecs, k=5, n_centroids=8, nprobe=8).collect()}
    want = {(r.query_id, r.cand_id, r.rank)
            for r in get("q_sim_topk").fn(spark, SF).collect()}
    assert got == want


def test_simhash_overflow_guard_raises(spark):
    """The packed 16-bit bit-vote counters saturate past 65535 tokens per
    doc; the guard must raise, not silently corrupt. Regression: the old
    if(isnull(assert_true(..)), fp, fp) form had IDENTICAL branches, so
    SimplifyConditionals folded the assert out of the optimized plan and
    overflow was silent (round-3 ADVICE)."""
    from telescope_data_pipeline_spark.operators.dedup import (
        simhash_fingerprints_jvm,
    )

    ok = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    assert simhash_fingerprints_jvm(ok, "doc_id", "text").count() == 1

    big = spark.createDataFrame([(2, "tok " * 65536)],
                                "doc_id long, text string")
    with pytest.raises(Exception, match="65535 tokens"):
        simhash_fingerprints_jvm(big, "doc_id", "text").collect()


def test_ivf_cell_assigner_matches_scalar_kernel(spark, vecs):
    """The batch-matmul assigner must produce the exact assignments of
    the per-row scalar kernel it replaced (same distances up to fp
    rounding far above tie resolution on real embeddings)."""
    import numpy as np

    from telescope_data_pipeline_spark.operators.similarity import (
        _cell_assigner,
        train_centroids,
    )

    cents = train_centroids(vecs, n_centroids=16)
    rows = vecs.select("vec_id", "embedding").orderBy("vec_id")
    got = (rows.withColumn("cells", _cell_assigner(cents, 4)("embedding"))
           .select("vec_id", "cells").collect())
    want = {}
    for r in rows.collect():
        a = np.asarray(r["embedding"], dtype=np.float64)
        d2 = ((cents - a) ** 2).sum(axis=1)
        want[r["vec_id"]] = list(np.argsort(d2, kind="stable")[:4])
    assert {r["vec_id"]: list(r["cells"]) for r in got} == want


def test_shingle_short_doc_yields_no_rows_not_crash(spark):
    """Docs shorter than the shingle width must be dropped, not crash:
    the unguarded sequence(0, n_sh-1) counted DOWN for short docs and
    fed slice() an illegal 0 start."""
    from telescope_data_pipeline_spark.operators.dedup import shingle

    df = spark.createDataFrame(
        [(1, "only two"), (2, ""), (3, "one two three four five")],
        "doc_id long, text string")
    out = {r.id: r.shingles for r in shingle(df, "doc_id", "text").collect()}
    assert set(out) == {3}
    assert "one two three" in out[3]


def test_ivf_index_persisted_probe(spark, vecs, tmp_path):
    """Persisted IVF index (operators/ivf_index.py): a full-width probe
    (nprobe = n_centroids) over the on-disk layout must reproduce the
    exact brute-force top-k, and the probe's scan must PARTITION-PRUNE
    to the probed cells (the cell predicate in PartitionFilters, not a
    post-scan filter)."""
    from telescope_data_pipeline_spark.operators.ivf_index import (
        ivf_index_probe,
        ivf_index_write,
    )
    from telescope_data_pipeline_spark.operators.similarity import (
        cosine,
        train_centroids,
    )
    from telescope_data_pipeline_spark.plans.audit import formatted_plan

    cents = train_centroids(vecs, n_centroids=8)
    path = str(tmp_path / "ivf")
    ivf_index_write(vecs, path, cents)

    qv = vecs.filter(F.col("vec_id") == 0).first()["embedding"]

    # exact when every cell is probed
    got = [(r.cand_id, r.cosine) for r in
           ivf_index_probe(spark, path, qv, nprobe=8, k=5,
                           exclude_id=0).collect()]
    brute = (vecs.filter(F.col("vec_id") != 0)
             .select(F.col("vec_id").alias("cand_id"),
                     F.round(cosine("embedding",
                                    F.array(*[F.lit(float(x)) for x in qv])),
                             6).alias("cosine"))
             .orderBy(F.desc("cosine"), F.asc("cand_id")).limit(5).collect())
    assert got == [(r.cand_id, r.cosine) for r in brute]

    # narrow probe: partition pruning visible in the plan
    narrow = ivf_index_probe(spark, path, qv, nprobe=2, k=5)
    plan = formatted_plan(narrow)
    assert "PartitionFilters" in plan
    part = plan.split("PartitionFilters")[1][:300]
    assert "cell" in part and "IN" in part, part
    # and the narrow probe's candidates all come from probed cells:
    # recall against full probe is structural, not asserted exactly
    assert narrow.count() <= 5


def test_embedding_near_duplicates_planted_and_plan(spark):
    """The production embedding-dedup path (banded LSH + exact verify):
    planted high-cosine pairs are found (deterministic under the fixed
    hyperplane seed), nothing below threshold survives (precision is
    exact by construction), and the plan contains no cross product."""
    import numpy as np

    from telescope_data_pipeline_spark.operators.similarity import (
        embedding_near_duplicates,
    )
    from telescope_data_pipeline_spark.plans.audit import physical_plan

    rng = np.random.default_rng(7)
    rows = []
    for i in range(40):
        v = rng.standard_normal(64)
        v /= np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
        if i < 6:  # plant a near-copy: tiny perturbation, cosine ~0.998
            w = v + 0.03 * rng.standard_normal(64)
            w /= np.linalg.norm(w)
            rows.append((100 + i, [float(x) for x in w]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = embedding_near_duplicates(df, threshold=0.9)
    pairs = {(r.id_a, r.id_b): r.cosine for r in got.collect()}
    for i in range(6):  # every planted copy found at >= 0.9
        assert (i, 100 + i) in pairs, (i, pairs)
        assert pairs[(i, 100 + i)] >= 0.9
    assert all(c >= 0.9 for c in pairs.values())
    plan = physical_plan(got)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dedup_embed_lsh_query_no_all_pairs(spark):
    """q_dedup_embed_lsh (the registered production demo) must plan as
    equi-joins only — the all-pairs form is reachable solely through
    the oracle anchor q_dedup_embed."""
    from telescope_data_pipeline_spark.plans.audit import physical_plan
    from telescope_data_pipeline_spark.queries import get

    df = get("q_dedup_embed_lsh").fn(spark, "/root/testdata/sf0.01")
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # and the verified pairs are a (non-strict) subset of the anchor's
    anchor = {(r.id_a, r.id_b)
              for r in get("q_dedup_embed")
              .fn(spark, "/root/testdata/sf0.01").collect()}
    mine = {(r.id_a, r.id_b) for r in df.collect()}
    assert mine <= anchor
