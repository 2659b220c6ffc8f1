"""Physical-plan shape assertions for the round-5 queries: the
property that matters at 100 TB is not the answer (the oracle checks
that) but WHICH plan produces it — a candidate-bounded join that
silently degrades to a nested loop is correct and useless. These pin
the shapes .explain audits found."""

from __future__ import annotations

import pytest

from conftest import SF_SMOKE

from tb_scale_spatial_data_pipeline_spark.plans import all_queries


def plan_of(spark, name: str) -> str:
    q = all_queries()[name](spark, SF_SMOKE)
    return q._jdf.queryExecution().executedPlan().toString()


def test_point_in_polygon_no_nested_loop(spark):
    """The PIP join must stay a cell equi-join + fold — a
    BroadcastNestedLoopJoin/CartesianProduct here means the blocking
    degraded to polys × points."""
    p = plan_of(spark, "spatial_point_in_polygon")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_salted_join_query_splits_hot_key(spark):
    """salted_skew_join must join on (key, salt) — the salt column in
    the join keys IS the skew split."""
    p = plan_of(spark, "salted_skew_join")
    assert "_salt" in p
    assert "CartesianProduct" not in p


def test_asof_union_window_single_window(spark):
    """The union-window as-of must plan ONE window over the union —
    not a join (the whole point vs the join+max form)."""
    p = plan_of(spark, "asof_union_window")
    assert "RunningWindowFunction" in p or "Window" in p
    for join_kind in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"):
        assert join_kind not in p, join_kind


def test_triangle_count_equi_joins_only(spark):
    """The three-way self-join must plan as equi joins on the wedge
    keys, never a cartesian of the edge set. (The single permitted
    nested loop is the final 1-row x 1-row edge-count crossJoin.)"""
    p = plan_of(spark, "triangle_count")
    assert "CartesianProduct" not in p
    assert p.count("BroadcastNestedLoopJoin") <= 1
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p or "BroadcastHashJoin" in p


def test_table_checksum_single_aggregate(spark):
    """The checksum is one map-side-combinable aggregation pass: no
    joins, no windows, exactly one final aggregate over partials."""
    p = plan_of(spark, "table_checksum")
    assert "Join" not in p
    assert "Window" not in p
    assert "HashAggregate" in p or "SortAggregate" in p


def test_funnel_no_events_squared(spark):
    """Funnel stages re-join grouped MINs — no events x events
    explosion, no nested loop."""
    p = plan_of(spark, "funnel_conversion")
    assert "CartesianProduct" not in p
    # the three stage-count crossJoins are 1-row x 1-row broadcasts —
    # nested-loop of single-row sides is fine; what must not appear is
    # a nested loop over the events relation itself, which (scanned
    # rows being grouped first) would show as a NLJ over a Scan
    assert p.count("BroadcastNestedLoopJoin") <= 2


def test_bloom_prefilter_plan_and_kmv_accuracy(spark):
    """The bloom prefilter must appear as two broadcast LEFT-SEMI
    hash joins ahead of the exact join (fact rows die before any
    shuffle), and the KMV estimate must land within the k=64
    bottom-k sketch's expected error band (~1/sqrt(k) ≈ 12.5%, test
    allows 3 sigma)."""
    from tb_scale_spatial_data_pipeline_spark.plans import all_queries

    qs = all_queries()
    sf = "/root/testdata/sf0.01"
    plan = qs["bloom_prefilter_join"](spark, sf)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("LeftSemi") == 2
    assert "BroadcastHashJoin" in plan

    row = qs["kmv_distinct_estimate"](spark, sf).collect()[0]
    est, true = float(row["est_distinct"]), float(row["true_distinct"])
    assert abs(est - true) / true < 0.375


def test_item_cooccurrence_stays_equi_join(spark):
    """Basket pair generation must remain an equi self-join on the
    order key — a CartesianProduct means items × items."""
    p = plan_of(spark, "item_cooccurrence_similarity")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_pmi_pair_generation_has_no_positional_join(spark):
    """PMI pairs come from per-row offset unrolling; the only joins
    are broadcast probes of the small unigram/total tables."""
    p = plan_of(spark, "pmi_cooccurrence")
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p


def test_mixture_sampling_never_shuffles_the_corpus(spark):
    """The per-lang probability table is broadcast back — the corpus
    joins without an Exchange on its own rows."""
    p = plan_of(spark, "mixture_sample_sources")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_cdc_reduces_changes_before_merging(spark):
    """The change stream collapses to one row per key (window
    last-wins) BEFORE the base join — no CartesianProduct, exactly
    one join."""
    p = plan_of(spark, "cdc_apply_changes")
    assert "CartesianProduct" not in p
    assert p.count("Join") >= 1


def test_inverted_search_broadcasts_stats(spark):
    """Postings are filtered to the query terms before any join; the
    df/total stat tables broadcast — no sort-merge join anywhere."""
    p = plan_of(spark, "inverted_index_search")
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_recommender_broadcasts_sim_table(spark):
    """The similarity head must broadcast into the scoring join; the
    owned-item exclusion may sort-merge (both sides are user-scale)."""
    p = plan_of(spark, "item_recommendations")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_incremental_dedup_antijoins_on_fingerprint(spark):
    """The base side must reach the anti-join as fingerprints only
    (text pruned from the scan)."""
    p = plan_of(spark, "incremental_dedup_ingest")
    assert "LeftAnti" in p
    assert "CartesianProduct" not in p


def _raw_global_windows(df):
    """simpleStrings of every zero-partition WindowExec in df's
    physical plan whose input subtree reaches a table scan with no
    reducing node (aggregate/limit/inner window) on the path — the one
    window shape that cannot survive a 100x scale-up. Global windows
    over AGGREGATED intermediates (bins, per-group stats, dimension
    ordinals) are deliberately not flagged."""
    from scripts.audit_global_windows import raw_global_windows

    return raw_global_windows(df._jdf.queryExecution().executedPlan())


# queries the round-6 verdict called out (items 1-5) + the two the
# round-7 full-registry audit additionally surfaced; all rebuilt on
# operators/quantiles.py distributed selection or block decomposition
_DEGLOBALIZED = (
    "range_partition_planner",
    "psi_drift_report",
    "woe_iv_binning",
    "rfm_segmentation",
    "sequence_gap_detection",
    "trimmed_winsorized_stats",
    "deterministic_ids",
)

# round-8 additions whose window usage must stay per-doc/per-query
# partitioned (gaps-and-islands, per-query top-k) — never global
_R8_WINDOWED = (
    "repeated_substring_spans",
    "ann_recall_report",
    "bm25_topk",
    "kneser_ney_bigram",
    "minhash_jaccard_calibration",
    "neardup_policy_sweep",
    "embedding_covariance_pairs",
    "cms_join_size_estimate",
    "prediction_calibration_report",
    "corpus_datasheet",
    "table_profile_lineitem",
    "closeness_centrality_sampled",
    "query_likelihood_dirichlet",
    "graph_diameter_sweep",
    "zonal_majority_filter",
    "raster_d8_flow",
    "spatial_knn_join",
    "raster_hist_equalization",
)


def test_no_single_partition_window_over_raw_tables(spark):
    """No headline query, and none of the de-globalized registry
    queries, may plan a single-partition WindowExec over an
    unaggregated base table. The full 307-query sweep is
    scripts/audit_global_windows.py (round-7 run: 0 flagged); this
    test pins the headline surface + every site the verdict flagged
    so a regression fails CI immediately."""
    from concurrent.futures import ThreadPoolExecutor

    import bench

    qs = all_queries()
    names = list(
        dict.fromkeys(
            list(bench.HEADLINE) + list(_DEGLOBALIZED) + list(_R8_WINDOWED)
        )
    )

    # pooled planning: ~90 queries x ~0.5 s driver-side analysis each
    # (queries never mutate session conf, so concurrent planning on the
    # shared session is safe)
    def _check(name):
        bad = _raw_global_windows(qs[name](spark, SF_SMOKE))
        return (name, bad[0][:120]) if bad else None

    with ThreadPoolExecutor(max_workers=8) as pool:
        offenders = dict(r for r in pool.map(_check, names) if r)
    assert not offenders, offenders


def test_cutpoint_binning_queries_plan_no_windows(spark):
    """The distributed-selection rewrites bin by broadcast literal
    cut-tuples, so the FINAL plan of these queries must contain no
    WindowExec at all (the selection itself runs at construction time
    on a separate checkpointed projection). A Window reappearing here
    means someone reverted to the ntile form."""
    qs = all_queries()
    for name in (
        "range_partition_planner",
        "woe_iv_binning",
        "rfm_segmentation",
        "trimmed_winsorized_stats",
        "psi_drift_report",
    ):
        p = plan_of(spark, name)
        assert "Window" not in p, name


def test_silhouette_broadcasts_centroids(spark):
    """Point-dims join k x dim centroid rows — centroids broadcast,
    points never shuffle for the distance computation."""
    p = plan_of(spark, "cluster_silhouette_report")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_grid_dbscan_candidate_bounded(spark):
    """DBSCAN must stay cell-equi-join-blocked: a CartesianProduct
    means points x points distances. The only nested-loop-shaped join
    allowed is the 1-row grid-side broadcast (the design-rule bound
    for BroadcastNestedLoopJoin is <=~10-row bound tables)."""
    p = plan_of(spark, "grid_dbscan_clusters")
    assert "CartesianProduct" not in p
    assert p.count("BroadcastNestedLoopJoin") <= 1


def test_d8_flow_accumulation_no_cartesian(spark):
    """The pointer-doubling closure must be equi-join rounds on the
    successor key — a CartesianProduct would be cells x cells."""
    p = plan_of(spark, "d8_flow_accumulation")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_rollup_single_expand_single_agg_shuffle(spark):
    """ROLLUP must plan as ONE Expand + partial/final hash aggregate
    around ONE agg shuffle (plus the output sort) — N margins for the
    price of one groupBy, never one scan per grouping set. A third
    exchange is permitted ONLY for the conditional spread_cpu
    round-robin in front of the Expand (r16: the single-split fixture
    scan otherwise serializes the expand+decimal partial aggregation;
    the spread is a no-op at production split counts)."""
    p = plan_of(spark, "rollup_revenue_margins")
    assert "Expand" in p
    # the only exchange beyond the agg shuffle + output sort may be
    # the round-robin spread itself — pin its kind so an unrelated
    # third exchange cannot hide behind the allowance
    assert p.count("RoundRobinPartitioning") <= 1
    assert p.count("Exchange") - p.count("RoundRobinPartitioning") <= 2
    assert "HashAggregate" in p
    # the grouping sets must still share one scan of lineitem
    assert p.count("Scan parquet") <= 1


def test_sparse_cosine_no_cartesian(spark):
    """The TF-IDF pair join must come from the inverted index (equi
    join on term) — a cartesian/nested-loop here means the df-pruned
    posting join degraded to all doc pairs."""
    p = plan_of(spark, "sparse_cosine_pairs")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "TakeOrderedAndProject" in p


def test_betweenness_equi_joins_only(spark):
    p = plan_of(spark, "betweenness_sampled")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_ktruss_equi_joins_only(spark):
    p = plan_of(spark, "ktruss_peeling")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_ktruss_degree_oriented(spark):
    """The per-round support pass must be the DEGREE-ORIENTED plan:
    triangles closed with a LEFT-SEMI probe of the oriented edge set
    and credited to their 3 edges via explode (Generate) — never the
    symmetrized wedge join whose fan-out is Θ(deg(hub)) per hub edge.
    The pin is source-level: the final executed plan only shows the
    snapshot union over localCheckpointed RDDs (per-round lineage is
    deliberately truncated), so the wedge join never appears in it.
    The per-round SUPPORT plan is pinned by building one round's
    support frame directly and asserting its own executed plan."""
    import inspect

    from tb_scale_spatial_data_pipeline_spark.plans import graph_queries

    src = inspect.getsource(graph_queries.q_ktruss_peeling)
    assert "left_semi" in src  # closing-edge probe is a semi join
    assert 'F.col("rp") < F.col("rq")' in src  # oriented-rank wedge arm
    assert "F.explode" in src  # 3-edge triangle credit
    # the symmetrized fan-out must be gone
    assert 'cur["u"] == s1["a1"]' not in src


def test_spatial_knn_join_no_forced_broadcast(spark):
    """The operator must not HINT a broadcast of the target side (at
    100 TB both sides are large); small fixtures may still AUTO
    broadcast under the size threshold, which is fine — the pin is on
    the join being a cell equi-join, not a nested loop."""
    from tb_scale_spatial_data_pipeline_spark.plans import spatial_queries
    import inspect

    src = inspect.getsource(spatial_queries.q_spatial_knn_join)
    assert "broadcast" not in src.lower()
    p = plan_of(spark, "spatial_knn_join")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_embedding_decontamination_broadcasts_benchmark(spark):
    """The benchmark side is the tiny one by construction — it must
    broadcast so the corpus never shuffles for the screen."""
    p = plan_of(spark, "embedding_decontamination")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p


def test_idw_broadcasts_grid(spark):
    """48 grid cells ride along as a broadcast; the points side never
    shuffles."""
    p = plan_of(spark, "idw_interpolation")
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p


def test_apriori_no_cartesian(spark):
    """Candidate generation is prefix-join + semi-join pruning; the
    support count is a basket equi-join chain — nothing quadratic in
    the item universe."""
    p = plan_of(spark, "apriori_brand_triples")
    assert "CartesianProduct" not in p


def test_gains_lift_no_raw_global_window(spark):
    """The decile assignment must ride the bounded score spine — the
    window's input is an Aggregate, never the raw fact scan (the shape
    scripts/audit_global_windows.py flags; the per-row ntile form this
    query originally had was flagged and rewritten)."""
    q = all_queries()["cumulative_gains_lift"](spark, SF_SMOKE)
    assert not _raw_global_windows(q)


def test_lof_candidates_equi_join_only(spark):
    """The 9-cell neighborhood must reach the join as an EQUI key
    (points register in their 9 surrounding cells) — a range-only
    join plans as a nested loop = points x points (measured hanging
    at sf0.1 before the rewrite)."""
    p = plan_of(spark, "lof_outlier_scores")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_pk_fanout_guard_pinned_in_edge_build(spark):
    """The co-supply pk self-join's per-part fan-out bound must be IN
    the dataflow: the guard join's count column and the raise_error
    check must survive optimization (the assert_true(...).isNull()
    form was silently erased by NullPropagation — this pins the
    surviving shape)."""
    from tb_scale_spatial_data_pipeline_spark.plans import graph_queries as gq

    eu = gq._undirected_edges(spark, SF_SMOKE)
    op = eu._jdf.queryExecution().optimizedPlan().toString()
    assert "raise_error" in op
    # the guard is a size() check on the per-part supplier array, folded
    # into the exploded column so pruning cannot drop it
    assert "fan-out exceeds" in op


def test_pk_fanout_guard_raises_on_hot_part(spark):
    """A part whose co-supplier count exceeds the bound must fail
    LOUDLY when the guarded column is consumed — the alternative at
    100x is a silent quadratic fan-out in one task."""
    from tb_scale_spatial_data_pipeline_spark.plans import graph_queries as gq

    old = gq._PK_FANOUT_BOUND
    gq._PK_FANOUT_BOUND = 3
    try:
        ps = spark.createDataFrame(
            [(1, i) for i in range(5)] + [(2, 9)], "pk int, u int"
        )
        with pytest.raises(Exception, match="fan-out exceeds"):
            gq._guard_pk_fanout(ps, "u").collect()
        ok = spark.createDataFrame([(1, 7), (2, 9)], "pk int, u int")
        assert sorted(r.u for r in gq._guard_pk_fanout(ok, "u").collect()) == [7, 9]
    finally:
        gq._PK_FANOUT_BOUND = old


def test_undirected_edges_guard_raises_through_pair_expansion(spark):
    """The fan-out bound must also trip inside _undirected_edges itself
    (the array-combination form checks size(us) on the grouped supplier
    array — same LOUD failure as the old window-count guard)."""
    from tb_scale_spatial_data_pipeline_spark.plans import graph_queries as gq

    old = gq._PK_FANOUT_BOUND
    gq._PK_FANOUT_BOUND = 1
    try:
        with pytest.raises(Exception, match="fan-out exceeds"):
            gq._undirected_edges(spark, SF_SMOKE).collect()
    finally:
        gq._PK_FANOUT_BOUND = old


def test_undirected_edges_matches_join_form(spark):
    """The sorted-array combination expansion must produce exactly the
    pair set of the reference pk self-join (u < v, distinct, md5
    bucket-thinned) — the contract every downstream graph query and
    its SQL oracle assume."""
    from pyspark.sql import functions as F

    from tb_scale_spatial_data_pipeline_spark.plans import graph_queries as gq
    from tb_scale_spatial_data_pipeline_spark.plans._util import t

    ps = (
        t(spark, SF_SMOKE, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    a = ps.select(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("u"))
    b = ps.select(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("v"))
    bucket = F.conv(
        F.substring(
            F.md5((F.col("u") * 1000 + F.col("v")).cast("string")), 1, 4
        ),
        16,
        10,
    ).cast("int")
    ref = (
        a.join(b, "pk")
        .where(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
        .where(bucket < 9830)
    )
    got = {(r.u, r.v) for r in gq._undirected_edges(spark, SF_SMOKE).collect()}
    want = {(r.u, r.v) for r in ref.collect()}
    assert got == want and len(got) > 0


def test_adamic_adar_equi_joins_only(spark):
    """AA's wedge enumeration must plan as equi joins on the wedge
    center — never a cartesian of the edge set (the one permitted
    nested loop is a broadcast-bounded scalar, as in triangle_count)."""
    p = plan_of(spark, "adamic_adar_topk")
    assert "CartesianProduct" not in p
    assert p.count("BroadcastNestedLoopJoin") <= 1


def test_textrank_no_positional_self_join(spark):
    """The word co-occurrence pair stream must come from per-row array
    offsets, not a positional self-join of the token stream. The final
    executed plan only shows the checkpointed rank RDD (per-iteration
    lineage is deliberately truncated), so the pin is source-level —
    the same approach as test_ktruss_degree_oriented."""
    import inspect

    from tb_scale_spatial_data_pipeline_spark.plans import lm_queries

    src = inspect.getsource(lm_queries.q_textrank_keywords)
    assert "flatten(transform(sequence" in src  # per-row offset pairs
    assert "posexplode" not in src  # no positional token stream
    assert "localCheckpoint" in src  # bounded per-iteration lineage
    p = plan_of(spark, "textrank_keywords")
    assert "CartesianProduct" not in p


def test_mmr_retrieval_is_topk_heap(spark):
    """MMR's corpus retrieval must plan as TakeOrderedAndProject (per-
    partition top-32 heap), never a global sort of the corpus."""
    from tb_scale_spatial_data_pipeline_spark.plans import vector_queries as vq

    import inspect

    src = inspect.getsource(vq.q_mmr_diversified_topk)
    assert ".limit(_MMR_CANDS)" in src  # heap via orderBy+limit
    assert "localCheckpoint" in src  # candidates materialize once


def test_nn_matching_no_shrinking_frames(spark):
    """propensity_nn_matching's neighbor scans must BOTH be running
    (expanding-prefix) frames: Spark re-evaluates a (1 FOLLOWING,
    UNBOUNDED FOLLOWING) frame per row — O(n²) per stratum, the 12.4×
    blow-up the r14 sf0.01→0.1 probe caught. The fix expresses "first
    control after me" as "last control before me" under the reversed
    sort; any reappearance of an unboundedfollowing frame is the
    regression."""
    p = plan_of(spark, "propensity_nn_matching").lower()
    assert "unboundedfollowing" not in p
    assert "cartesianproduct" not in p


def test_sample_entropy_pair_join_is_broadcast(spark):
    """sample_entropy's quadratic lives ONLY on the bounded day spine:
    the pair join must be broadcast (spine vs spine), never a shuffled
    sort-merge over row volume."""
    p = plan_of(spark, "sample_entropy")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_brand_scc_edges_join_is_bounded(spark):
    """brand_transition_scc's closure joins run on the <=625-edge
    brand digraph — a CartesianProduct anywhere means the reachability
    step lost its equi-join key."""
    p = plan_of(spark, "brand_transition_scc")
    assert "CartesianProduct" not in p


def test_elo_fold_is_single_aggregate(spark):
    """elo_brand_ratings' sequential recursion must run as ONE
    Catalyst higher-order fold over the collected duel array — a
    CartesianProduct or a python UDF in the plan means the fold
    decomposed."""
    p = plan_of(spark, "elo_brand_ratings")
    assert "aggregate(" in p or "Aggregate" in p
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p
