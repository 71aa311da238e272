"""Regenerate PLANS.md — the human-audit capture of physical plans.

Usage:  python tools/gen_plans.py [sf_dir]

tests/test_plans.py is the *enforced* layer (assertions on plan
properties); PLANS.md is the audit layer showing the full formatted
plans those assertions are about. Regenerate after any plan-affecting
change (join strategy, new headline operator, optimizer-visible
rewrite) so the audit file matches HEAD.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from telescope_data_pipeline_spark.plans.audit import formatted_plan
from telescope_data_pipeline_spark.queries import get
from telescope_data_pipeline_spark.session import get_spark

#: (query name, one-line scale property the plan demonstrates)
CAPTURE = [
    ("q_flagship",
     "date filters pushed to both scans, dim broadcast, partial+final agg"),
    ("q_join_nn",
     "grid-bucketed NN join: equi-join on cell ids, window top-1, no cross product"),
    ("q_agg_sigclip",
     "3 clip iterations over ONE hash partitioning (single Exchange)"),
    ("q_join_asof",
     "as-of join as union + ignorenulls-last window: no join operator at all"),
    ("q_sim_bucketed",
     "similarity scale path: hash equi-join on cell key, window top-5"),
    ("q_annulus_background",
     "ring median via neighbor-cell explode + equi-join (linear, no theta-join)"),
    ("q_events_funnel",
     "running conditional mins + same-key groupBy: one hash exchange"),
    ("q_decontaminate",
     "benchmark gram set broadcast to exploded corpus grams"),
    ("q_agg_salted",
     "two-stage salted aggregation: hot key spread over 16 partials, DECIMAL-exact sums"),
    ("q_dedup_simhash",
     "JVM packed-bit-vote fingerprints, banded self-join, popcount refine before distinct"),
    ("q_tfidf",
     "explode + map-side-combine aggs; vocabulary join left to AQE (broadcast while it fits)"),
    ("q_unigram_logprob",
     "two aggs + AQE-chosen vocab join; scalar total is a 1-row broadcast"),
    ("q_pack_sequences",
     "distributed two-phase prefix sum: range partition + driver fold, no single-partition window"),
    ("q_doc_chunks",
     "per-row sequence()+slice() chunking: map-only, zero Exchange at any scale"),
    ("q_mix_corpus_hash",
     "md5-threshold corpus mixing: pure scan+filter, zero Exchange (rank form sorts per language)"),
    ("q_dup_spans",
     "exact substring dedup: md5-digested gram groupBy + position join-back, 16-byte shuffle keys"),
    ("q_bm25",
     "BM25: query-term filter before shuffle, df table + 1-row stats broadcast"),
    ("q_scd2",
     "SCD2 history merge: one equi-join + union, no window, no sort"),
    ("q_dedup_incremental",
     "incremental ingestion dedup: batch groupBy + digest anti-join against the corpus index"),
    ("q_quality_gate",
     "C4/Gopher rule cascade: per-row HOFs, map-only, zero Exchange"),
    ("q_epoch_shuffle",
     "seeded permutation: distributed rank (bucket bases + local windows), no single-partition sort"),
    ("q_weighted_sample",
     "Efraimidis-Spirakis keys + TakeOrderedAndProject: per-partition heaps, no global sort"),
    ("q_dedup_simhash_md5",
     "relational SimHash: 64 map-side-combined bit votes, banded equi-join, popcount refine"),
    ("q_line_dedup",
     "C4 boilerplate removal: md5-digest block counts (16-byte shuffle), order-restoring re-assembly"),
    ("q_quality_percentile",
     "per-language percentile gate: |langs|-row broadcast back onto an unshuffled corpus scan"),
    ("q_mix_token_budget",
     "token-budget mixing: per-source running sum in content-hash order, one hash exchange"),
    ("q_dedup_bloom",
     "two-tier bloom dedup: map-only literal probe, digest anti-join rescue of the maybe-set"),
    ("q_dedup_canonical",
     "canonical-copy selection: rank + group-size over one shared window exchange"),
    ("q_kmeans_step",
     "Lloyd iteration: broadcast centroids, min_by argmin, (cluster, dim) mean groupBy"),
    ("q_inverted_index",
     "index build: per-doc distinct map-side, ONE term groupBy (single hash exchange)"),
    ("q_pagerank",
     "Pregel step relationally: |E| equi-join + dst groupBy; |V| scalar as 1-row broadcast"),
    ("q_zorder_key",
     "Morton layout key: per-row integer bit fold, zero Exchange"),
    ("q_pq_adc",
     "PQ: broadcast codebooks + ADC lookup; shuffle carries byte codes, never vectors"),
    ("q_triangle_count",
     "degree-oriented wedge join: equi-joins only, hub fanout bounded by orientation"),
    ("q_fuzzy_join",
     "FastSS: variant equi-join candidates + JVM levenshtein refine, no all-pairs"),
    ("q_ohlc_bars",
     "OHLC bars: min_by/max_by partial states, one map-side-combined groupBy"),
    ("q_setsim_join",
     "PPJoin: df-ordered prefix tokens equi-join candidates, verify on survivors"),
    ("q_ivf_probe",
     "IVF ANN: broadcast assignment + nprobe cell semi-join prune + TakeOrdered top-5"),
    ("q_negative_sample",
     "hash-ring negatives: bucket equi-join probes, per-probe hash-min window"),
    ("q_bigram_pmi",
     "PMI: map-only bigram fold, support floors before vocab joins, 1-row total broadcast"),
    ("q_mv_maintenance",
     "incremental MV merge: partial aggs both sides, union, |keys| final merge"),
    ("q_quantile_norm",
     "per-source percent rank: rank+count share ONE hash exchange"),
    ("q_semdedup",
     "SemDeDup: broadcast-centroid assignment, cid-keyed hash join for in-cluster pairs"),
    ("q_dsir",
     "DSIR: 256-bucket model broadcast onto token stream, integer nano-unit weight sum"),
    ("q_join_interval",
     "interval overlap join: bucket equi-join candidates, canonical-bucket dedup, exact refine"),
    ("q_heavy_hitters",
     "heavy hitters: MG candidate semi-join + exact rescue count, no full frequency table"),
    ("q_time_weighted_avg",
     "time-weighted avg: lead segments, hour-split explode, integer-weighted map-side agg"),
    ("q_skyline",
     "skyline: lossless grid pre-filter (cell theta join on <=G^2 rows), window over survivors only"),
    ("q_ks_drift",
     "KS drift: jump-point counts, type-keyed cumulative window, per-type totals broadcast"),
    ("q_winsorize",
     "winsorize: exact-percentile pass broadcast back onto an unshuffled clip+agg scan"),
    ("q_containment_join",
     "containment join: one-sided df-ascending prefix equi-join, integer-threshold verify"),
    ("q_rank_fusion",
     "RRF: both legs end in TakeOrdered top-100; fusion joins two 100-row lists"),
    ("q_phrase_search",
     "phrase query: postings filtered to phrase terms pre-shuffle, (doc,pos+1) equi-join"),
    ("q_maxsim_late",
     "MaxSim: 4-row query-slice broadcast, JVM fold cosine, two-level mergeable reduction"),
    ("q_doremi_step",
     "DoReMi: 256-row model broadcast on token stream, one source-keyed loss aggregate"),
    ("q_shard_export",
     "shard export: distributed prefix-sum assignment, partitioned write, read-back manifest"),
    ("q_label_knn_noise",
     "label-noise audit: rounded-cosine 5-NN vote, labels ride the join as ints"),
    ("q_kneser_ney",
     "KN bigram LM: in-row bigram explode, cached count table reused by 4 consumers, top-20 broadcast enrichment"),
    ("q_hll_union",
     "HLL: one register groupBy, broadcast spine fill, integer 2^-53-unit harmonic sum"),
    ("q_cms_count",
     "Count-Min: map-side-combined fold onto 2048 cells, top-10 probes ride a broadcast"),
    ("q_markov_transitions",
     "Markov matrix: one user_id lag window, normalizer window over the |types|^2 AGGREGATED table"),
    ("q_bpe_merge_step",
     "BPE merge step: vocab groupBy, in-row pair explode (|vocab| cost), TakeOrdered cut, no join"),
    ("q_small_order_revenue",
     "Q17 shape: part filter broadcast into both fact passes, integer centi-unit threshold join"),
    ("q_dq_rules",
     "DQ suite: same-scan rules fused per conditional aggregate, FK+temporal share one left join"),
    ("q_late_supplier",
     "Q21 shape: EXISTS + NOT EXISTS collapsed into one per-order aggregate, no lineitem self-join"),
    ("q_label_propagation",
     "LPA communities: per-iteration |E| equi-join + vote count + node window, Pregel contract"),
    ("q_sessionize",
     "gap-and-island sessions: lag, flag cumsum, per-session agg over ONE user_id exchange"),
    ("q_rfm_segments",
     "RFM: broadcast percentile thresholds instead of ntile's global-sort window"),
    ("q_seasonal_baseline",
     "seasonal profile broadcast back onto an unshuffled fact scan, integer moments"),
    ("q_changepoint",
     "change-point: prefix/total/argmax windows share one series exchange, integer statistic"),
    ("q_source_overlap",
     "contamination matrix: DISTINCT (source, digest) before the digest equi-join"),
    ("q_attribution",
     "last-touch: ignore-nulls last_value with 1-PRECEDING frame, one window pass"),
    ("q_kmv_theta",
     "KMV: two-phase bottom-k (sharded then final window), hash equi-join intersection"),
    ("q_lift_gains",
     "lift/gains: two-phase bucketed global rank, 10-cell decile agg, no global sort"),
    ("q_mutual_info",
     "MI: one groupBy onto |X|*|Y| cells, margins re-aggregate cells, scalar broadcasts"),
    ("q_table_diff",
     "table diff: (key, digest) projections into one FULL OUTER equi-join, 4-cell count"),
    ("q_psi_drift",
     "PSI: one side-flagged scan, 1-row edge broadcast, 10-bin map-side-combined count"),
    ("q_assoc_rules",
     "assoc rules: basket-keyed self-join (fan-out = basket^2), broadcast brand dims"),
    ("q_adamic_adar",
     "Adamic-Adar: degree cap joined UNDER both self-join branches — hubs pruned pre-pair"),
    ("q_theilsen",
     "Theil-Sen: left-semi size band under both pair-join branches, user-keyed pairs"),
    ("q_feature_hashing",
     "hashing trick: map-only token hash, 64-bucket agg, zero joins in the plan"),
    ("q_pca_power_step",
     "PCA step: explode + cell groupBy + d-row broadcast — Gram matrix never materializes"),
    ("q_cuped",
     "CUPED: one conditional-agg fact pass, pooled theta as 1-row broadcast"),
    ("q_mann_whitney",
     "Mann-Whitney: rank algebra on distinct pooled values, KS jump-point shape"),
    ("q_burstiness",
     "burstiness: one user exchange shared by lag window + stats groupBy"),
    ("q_rolling_median",
     "rolling median: 4 lags + in-row array sort, one series exchange, no join"),
    ("q_embed_int8",
     "int8 audit: 1-row scale broadcast, map-only explode, two cell groupBys"),
    ("q_centroid_sim",
     "centroid sim: one groupBy onto labels x d cells, metadata-sized pair join"),
    ("q_spearman",
     "integer average-ranks via per-group windows; Pearson on exact BIGINT rank sums"),
    ("q_cramers_v",
     "chi-square margins via windows over the CELL table, nano-int term sum"),
    ("q_mcc",
     "one conditional-aggregate pass to a 1-row confusion matrix"),
    ("q_js_drift",
     "conditional-count groupBy on source + 1-row totals broadcast"),
    ("q_target_encode",
     "LOO encode: stats groupBy joined back on the key, sample filter pushed to the probe scan"),
    ("q_fleiss_kappa",
     "3-rater explode, two map-side-combined groupBys, 1-row output"),
    ("q_did",
     "4-cell centi-int sufficient stats from ONE conditional-aggregate pass"),
    ("q_bayes_ab",
     "per-user conversion groupBy then a 1-row conditional aggregate"),
    ("q_keyword_tfidf",
     "corpus df shuffle + sampled tf probe side, nano-int top-3 window per doc"),
    ("q_assortativity",
     "degree Pearson over the SHARED cached co-purchase edge list (InMemoryRelation legs)"),
    ("q_info_gain",
     "decision stump: eight integer conditional counts in one groupBy pass"),
    ("q_sprt",
     "integer window cumsums per stream; first crossing via filtered rank, join back to totals"),
]

HEADER = """\
# PLANS — captured physical plans (sf0.01, local[32], AQE on)

Auto-generated by `tools/gen_plans.py`; regenerate after plan-affecting
changes. These are the plans `tests/test_plans.py` asserts properties
of — shown here in full for audit.
"""


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("gen_plans")
    out = [HEADER]
    for name, note in CAPTURE:
        print(f"capturing {name} ...", flush=True)
        df = get(name).fn(spark, sf_dir)
        out.append(f"\n## {name}\n\n*{note}*\n\n```\n{formatted_plan(df)}```\n")
    path = Path(__file__).resolve().parents[1] / "PLANS.md"
    path.write_text("".join(out))
    print(f"wrote {path} ({len(CAPTURE)} plans)")


if __name__ == "__main__":
    main()
