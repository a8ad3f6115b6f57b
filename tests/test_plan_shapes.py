"""Physical-plan assertions for the headline plans — the 100 TB
contract made checkable: filters reach the parquet scan, projections
prune columns, dimensions broadcast, top-k pushes below the window
shuffle, range joins execute as equi-joins (not nested loops), and no
Python appears in any JVM-path query.
"""

from __future__ import annotations

import contextlib
import io

from bow_hunter_pipeline_spark.plans import (
    analytics,
    dedup,
    relational,
    multimodal,
    simsearch,
    textanalysis,
    traindata,
)
from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_pricing_summary_pushes_filter_and_prunes_columns(spark):
    plan = _plan(analytics.pricing_summary(spark, SF_SMOKE))
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters", 1)[1].split("\n")[0]
    # 7 needed columns, not all 11
    read_schema = plan.split("ReadSchema", 1)[1].split("\n")[0]
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema


def test_revenue_by_nation_broadcasts_dimensions(spark):
    plan = _plan(analytics.revenue_by_nation(spark, SF_SMOKE))
    # nation (hinted) + customer (size-chosen at this sf) both broadcast
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_revenue_by_nation_customer_broadcast_is_size_chosen_not_forced(spark):
    # customer grows with sf (150k×sf): its join must carry NO broadcast
    # hint, so with the size-based path disabled it degrades to a
    # shuffle join while the hinted, fixed-size nation leg stays
    # broadcast. A forced customer hint would survive the threshold and
    # OOM a 100 TB run.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(analytics.revenue_by_nation(spark, SF_SMOKE))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # formatted explain names each operator twice (tree + detail): one
    # broadcast join (the nation hint) → exactly 2 mentions; customer
    # degrades to the sort-merge path (li⋈orders + ⋈cust = 2 SMJs).
    assert plan.count("BroadcastHashJoin") == 2
    assert plan.count("SortMergeJoin") == 4


def test_top_k_pushes_group_limit_below_shuffle(spark):
    plan = _plan(analytics.top_k_per_group(spark, SF_SMOKE))
    # partial WindowGroupLimit before the exchange + final after
    assert plan.count("WindowGroupLimit") >= 2


def test_cascade_stage1_rank_is_group_limited(spark):
    """The cascade's stage-1 top-C per probe must plan a partial
    WindowGroupLimit below the q_id exchange — each map task keeps
    only C rows per probe, so the shuffle into the (few) probe
    partitions carries O(probes × C × tasks), never the full
    probes × corpus score table."""
    plan = _plan(simsearch.ann_cascade_topk(spark, SF_SMOKE))
    assert plan.count("WindowGroupLimit") >= 2, plan[:1500]


def test_range_join_is_equi_join_not_nested_loop(spark):
    plan = _plan(relational.range_join_value_bands(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_jvm_path_plans_have_no_python_eval(spark):
    for df in (
        textanalysis.doc_stats(spark, SF_SMOKE),
        textanalysis.rolling_fingerprint(spark, SF_SMOKE),
        dedup.minhash_lsh_pairs(spark, SF_SMOKE),
        simsearch.cosine_topk(spark, SF_SMOKE),
        relational.asof_join_error_context(spark, SF_SMOKE),
    ):
        plan = _plan(df)
        assert "EvalPython" not in plan, plan  # no row/arrow Python UDFs
        assert "MapInPandas" not in plan


def test_h6_plans_stay_jvm_side(spark):
    # the training-data operators are built-ins only — no Python eval
    for df in (
        traindata.sequence_packing(spark, SF_SMOKE),
        traindata.contamination_check(spark, SF_SMOKE),
        traindata.repetition_filter(spark, SF_SMOKE),
        traindata.domain_upsample(spark, SF_SMOKE),
        textanalysis.bpe_token_count(spark, SF_SMOKE),
    ):
        plan = _plan(df)
        assert "EvalPython" not in plan, plan
        assert "MapInPandas" not in plan


def test_contamination_join_is_hash_join_on_shingle(spark):
    plan = _plan(traindata.contamination_check(spark, SF_SMOKE))
    # equi-join on the shingle — never a nested loop / cartesian
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_sequence_packing_is_one_window_over_source(spark):
    plan = _plan(traindata.sequence_packing(spark, SF_SMOKE))
    assert "Window" in plan
    assert "Join" not in plan  # pure cumsum + arithmetic, no join leg


def test_domain_upsample_has_no_pre_agg_shuffle(spark):
    plan = _plan(traindata.domain_upsample(spark, SF_SMOKE))
    # narrow explode feeding the aggregate: the agg's own exchange plus
    # the (source, doc_id) partial that exact count_distinct needs —
    # two exchanges total (formatted explain mentions each twice),
    # nothing upstream of the Generate
    assert plan.count("Exchange") <= 4
    assert "Join" not in plan
    # the explode happens directly on the scan output — no shuffle in
    # between (Generate sits under the first partial aggregate)
    assert "Generate" in plan


def test_multimodal_scan_prunes_to_needed_columns(spark):
    plan = _plan(multimodal.decode_meta(spark, SF_SMOKE))
    assert "MapInPandas" in plan  # the Arrow boundary is the design
    read_schema = plan.split("ReadSchema", 1)[1].split("\n")[0]
    # only doc_id + text feed the payload; lang/source/n_chars pruned
    assert "lang" not in read_schema and "n_chars" not in read_schema


def test_asof_join_is_single_shuffle_window(spark):
    plan = _plan(relational.asof_join_error_context(spark, SF_SMOKE))
    # union + window, not a join: no join operator at all in the plan
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # one hash exchange (+AQE read)


def test_q7_broadcasts_all_dimension_legs(spark):
    plan = _plan(relational.q7_volume_shipping(spark, SF_SMOKE))
    # supplier + both nation roles broadcast; only lineitem⋈orders
    # (fact-to-fact) and customer may shuffle
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q4_exists_is_semi_join_with_pushed_range(spark):
    plan = _plan(relational.q4_priority_exists(spark, SF_SMOKE))
    assert "LeftSemi" in plan  # EXISTS never multiplies rows
    pushed = plan.split("PushedFilters", 1)[1].split("\n")[0]
    assert "o_orderdate" in pushed  # one year scanned, not seven


def test_q13_outer_join_preserves_zero_count_customers(spark):
    plan = _plan(relational.q13_customer_distribution(spark, SF_SMOKE))
    assert "LeftOuter" in plan
    # orders scan prunes to the two needed columns
    read_schema = plan.split("ReadSchema", 1)[1]
    assert "o_totalprice" not in read_schema


def test_argmin_joins_back_via_broadcast(spark):
    plan = _plan(relational.argmin_cheapest_per_brand(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_multi_distinct_plans_single_expand(spark):
    plan = _plan(relational.multi_distinct_monthly(spark, SF_SMOKE))
    # several COUNT(DISTINCT) = one Expand + staged aggs, not N jobs
    assert "Expand" in plan


def test_ivf_topk_stays_jvm_side(spark):
    plan = _plan(simsearch.ivf_topk(spark, SF_SMOKE))
    assert "EvalPython" not in plan
    assert "MapInPandas" not in plan


def test_q5_same_nation_constraint_rides_broadcast_join(spark):
    plan = _plan(relational.q5_local_supplier_volume(spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 3  # supplier, nation, region legs
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_disjunctive_join_stays_hash_join(spark):
    plan = _plan(relational.disjunctive_join(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan  # equi-conjunct extracted
    assert "BroadcastNestedLoopJoin" not in plan


def test_corr_is_single_aggregate_pass(spark):
    plan = _plan(relational.corr_qty_price(spark, SF_SMOKE))
    # five co-moment sums share one shuffle (plus AQE read), no joins
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2


def test_tfidf_broadcasts_corpus_count(spark):
    from bow_hunter_pipeline_spark.plans import textanalysis as ta
    plan = _plan(ta.tfidf_top_terms(spark, SF_SMOKE))
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    assert "CartesianProduct" not in plan  # 1-row total frame broadcast


def test_q6_pushes_all_three_range_predicates(spark):
    from bow_hunter_pipeline_spark.plans import tpch

    plan = _plan(tpch.q6_forecast_revenue(spark, SF_SMOKE))
    pushed = plan.split("PushedFilters", 1)[1].split("\n")[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed
    # formatted explain puts the distribution on the Arguments: line
    assert "hashpartitioning(" not in plan  # scan → partial/final agg only


def test_q10_topk_is_heap_not_full_sort(spark):
    from bow_hunter_pipeline_spark.plans import tpch

    plan = _plan(tpch.q10_returned_items(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan  # nation leg


def test_q18_aggregates_before_joining(spark):
    from bow_hunter_pipeline_spark.plans import tpch

    plan = _plan(tpch.q18_large_volume_customers(spark, SF_SMOKE))
    # the HAVING-gated aggregate is the ONLY shuffle; both joins run as
    # broadcasts against the tiny filtered aggregate — lineitem is
    # never exchanged at its raw grain
    assert "HashAggregate" in plan
    assert plan.count("hashpartitioning(") == 1
    assert plan.count("BroadcastHashJoin") >= 2


def test_q21_semi_and_anti_probe_without_extra_exchange(spark):
    from bow_hunter_pipeline_spark.plans import tpch

    plan = _plan(tpch.q21_waiting_suppliers(spark, SF_SMOKE))
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q8_broadcasts_every_dimension_leg(spark):
    from bow_hunter_pipeline_spark.plans import tpch

    plan = _plan(tpch.q8_market_share(spark, SF_SMOKE))
    # part, both nation roles, region(folded into nation), supplier
    assert plan.count("BroadcastHashJoin") >= 4


def test_udf_plans_use_arrow_eval_not_batch_python(spark):
    from bow_hunter_pipeline_spark.plans import pandas_udfs

    scalar = _plan(pandas_udfs.udf_scalar_token_stats(spark, SF_SMOKE))
    assert "ArrowEvalPython" in scalar  # vectorized, not BatchEvalPython
    assert "BatchEvalPython" not in scalar
    gmap = _plan(pandas_udfs.udf_grouped_map_neighbors(spark, SF_SMOKE))
    assert "FlatMapGroupsInPandas" in gmap
    cg = _plan(pandas_udfs.udf_cogrouped_order_profile(spark, SF_SMOKE))
    assert "FlatMapCoGroupsInPandas" in cg


def test_window_distribution_single_window_exec_per_sort(spark):
    plan = _plan(relational.window_distribution_functions(spark, SF_SMOKE))
    # two distinct sort orders (desc ranking family + asc RANGE band)
    # → at most 2 window exchanges; the six functions must not fan out
    # into one exchange each
    assert plan.count("hashpartitioning(") <= 2


def test_scalar_function_suites_have_no_shuffle(spark):
    from bow_hunter_pipeline_spark.plans import funcfamilies

    for fn in (funcfamilies.string_function_suite, funcfamilies.date_arithmetic):
        plan = _plan(fn(spark, SF_SMOKE))
        # pure per-row projection: scan → codegen'd project, nothing else
        assert "hashpartitioning(" not in plan and "Exchange" not in plan
        assert "EvalPython" not in plan


def test_array_and_map_plans_aggregate_once_per_level(spark):
    from bow_hunter_pipeline_spark.plans import funcfamilies

    plan = _plan(funcfamilies.array_set_ops(spark, SF_SMOKE))
    assert plan.count("hashpartitioning(") == 1  # the single groupBy
    plan = _plan(funcfamilies.map_functions(spark, SF_SMOKE))
    # two-level aggregate: (cust, prio) then cust — at most 2 exchanges
    assert plan.count("hashpartitioning(") <= 2


def test_corpus_filters_are_shuffle_free_map_plans(spark):
    # pii_redaction / quality_rules / url_strip are per-doc corpus
    # filters: at 100 TB they must stream at scan speed — no Exchange,
    # no Generate (explode), no Python eval anywhere in the plan
    for df in (
        traindata.pii_redaction(spark, SF_SMOKE),
        traindata.quality_rules(spark, SF_SMOKE),
        traindata.url_strip(spark, SF_SMOKE),
    ):
        plan = _plan(df)
        assert "Exchange" not in plan, plan
        assert "Generate" not in plan, plan
        assert "EvalPython" not in plan, plan
        # the scan side stays inside whole-stage codegen (higher-order
        # lambda projections are interpreted by design, but nothing
        # leaves the JVM)
        assert "codegen id" in plan, plan


def test_mixture_weights_windows_only_post_agg_rows(spark):
    # the single-partition window must sit ABOVE the groupBy(source)
    # aggregate (domain-cardinality rows), never over raw documents:
    # exactly one HashAggregate pair feeding Window, no join leg
    plan = _plan(traindata.mixture_weights(spark, SF_SMOKE))
    assert "Window" in plan
    assert "Join" not in plan
    # the tree prints root-first, so the windows sit ABOVE (consume)
    # the aggregate: exactly the groupBy's partial/final exchange pair
    # plus the single-partition window exchange — nothing else
    assert "HashAggregate" in plan
    assert plan.count("Exchange (") <= 2, plan


def test_funnel_is_single_exchange_window_chain(spark):
    # both conditional-min windows and the per-user aggregate share the
    # user_id partitioning: ONE exchange total (the classic 3-agg ×
    # 2-join funnel costs five)
    from bow_hunter_pipeline_spark.plans import events

    plan = _plan(events.funnel_stages(spark, SF_SMOKE))
    assert "Join" not in plan
    assert plan.count("Exchange (") <= 1, plan
    assert plan.count("Window (") == 2, plan


def test_int8_quantize_is_shuffle_free(spark):
    plan = _plan(simsearch.int8_quantize(spark, SF_SMOKE))
    assert "Exchange" not in plan, plan
    assert "Generate" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_mmr_rerank_localizes_only_the_rerank(spark):
    # candidate generation must stay JVM-side (broadcast + window);
    # exactly one grouped-map Pandas exec for the per-probe re-rank
    plan = _plan(simsearch.mmr_rerank(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # formatted explain names each operator twice (tree + detail)
    assert plan.count("FlatMapGroupsInPandas") == 2, plan


def test_semdedup_assignment_broadcasts_centroids(spark):
    # both Lloyd assignments ride a broadcast of the one-row centroid
    # list (no shuffle for argmin); the pair join keys on cluster, so
    # no cartesian anywhere; everything stays JVM-side
    plan = _plan(simsearch.semdedup_kmeans(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in plan  # 1-row centroid cross join
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_rare_token_score_corpus_mean_is_broadcast_scalar(spark):
    # the corpus-mean scalar joins back as a broadcast of one row, not
    # a global window over per-doc rows
    plan = _plan(traindata.rare_token_score(spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in plan
    assert "Window (" not in plan, plan


def test_tokenizer_vocab_topk_is_heap_not_full_sort(spark):
    # the vocab cut must plan as TakeOrderedAndProject (per-partition
    # heaps of K), never a global Sort + Limit
    plan = _plan(traindata.tokenizer_vocab(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastHashJoin" in plan  # K-row vocab broadcasts


def test_zorder_layout_is_single_aggregation_pass(spark):
    # Morton coding is a narrow projection: one exchange (the bucket
    # groupBy), no joins, no Python
    from bow_hunter_pipeline_spark.plans import pipeline as pipeline_plans

    plan = _plan(pipeline_plans.zorder_layout(spark, SF_SMOKE))
    assert "Join" not in plan
    assert plan.count("Exchange (") <= 1, plan
    assert "EvalPython" not in plan


def test_curation_pipeline_filters_before_hashing(spark):
    # the quality Filter must sit below the MinHash explode/aggregate
    # (hash survivors only); funnel accounting is ONE conditional
    # aggregate over stage flags (single final HashAggregate pair, not
    # four per-stage aggregates joined) — no cartesian, no Python
    plan = _plan(traindata.curation_pipeline(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    # one keep-first window, one drop-list outer join, ONE final
    # aggregate — the four-summaries-joined form costs ~12 exchanges
    assert plan.count("Window (") == 1, plan
    # formatted explain names each operator twice (tree + detail)
    assert plan.count("SortMergeJoin") == 2, plan
    assert plan.count("Exchange (") <= 7, plan


def test_pagerank_iterations_join_then_reaggregate(spark):
    # 3 unrolled rounds: score⋈edges joins + dst re-aggregations, all
    # hash-based; the N scalar rides a 1-row broadcast, never a collect
    from bow_hunter_pipeline_spark.plans import graph

    plan = _plan(graph.pagerank_weights(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert "TakeOrderedAndProject" in plan, plan  # top-20 is a heap


def test_ivf_pq_join_keys_include_cell(spark):
    """IVF-PQ's ADC join must carry the cell id IN the hash-join key —
    that is what makes it IVF-pruned rather than a global PQ scan. The
    probe distance table broadcasts; candidates never shuffle on a
    cell-less key."""
    plan = _plan(simsearch.ivf_pq_topk(spark, SF_SMOKE))
    # the code join's key list (formatted-explain detail section) must
    # name all three components (s, code, cell_id)
    key_lines = [
        ln for ln in plan.splitlines() if ln.startswith("Left keys")
    ]
    assert any(
        "cell_id" in ln and "code" in ln for ln in key_lines
    ), f"no (s, code, cell_id)-keyed join in: {key_lines}"
    assert "CartesianProduct" not in plan


def test_dsir_proxy_counts_are_map_side_combined(spark):
    """The DSIR proxy's two token-count aggregates must partial-agg
    before their exchanges (vocabulary-sized shuffles, not corpus-
    sized), and the whole plan stays JVM-side."""
    plan = _plan(traindata.dsir_proxy(spark, SF_SMOKE))
    assert "partial_count" in plan  # map-side combine present
    assert "BatchEvalPython" not in plan and "mapInPandas" not in plan


def test_nearest_sensor_argmin_collapses_before_shuffle(spark):
    """The sensor expansion (|points| × 25) must collapse via partial
    min(struct) BEFORE the customer-key exchange — the argmin is
    map-side, so the shuffle carries one row per customer."""
    from bow_hunter_pipeline_spark.plans import analytics as an

    plan = _plan(an.nearest_sensor_join(spark, SF_SMOKE))
    assert "partial_min" in plan
    assert "CartesianProduct" not in plan


def test_bucketed_lsh_join_is_exchange_free(spark):
    """h1_bucketed_lsh_pairs' candidate self-join must consume the
    bucket table's at-rest partitioning: with broadcast disabled, the
    only exchange in the whole plan is the final distinct — the join
    itself moves no data."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = dedup.bucketed_lsh_pairs(spark, SF_SMOKE)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_dpp_join_injects_runtime_partition_filter(spark):
    """a4_dpp_pruned_join's fact scan must carry a dynamicpruning
    partition filter fed by the dimension — join-time partition skip,
    not a full-lake scan."""
    from bow_hunter_pipeline_spark.plans import pipeline as pl

    plan = _plan(pl.dpp_pruned_join(spark, SF_SMOKE))
    assert "dynamicpruning" in plan.lower(), plan


def test_filtered_ivf_pushes_lang_predicate_below_distance(spark):
    """h2_filtered_ivf_topk's contract: the metadata predicate is
    composed into the index — lang = 'en' reaches the documents
    parquet scan (PushedFilters), i.e. candidates are pruned BELOW
    the cosine computation, and the probe side stays broadcast."""
    plan = _plan(simsearch.filtered_ivf_topk(spark, SF_SMOKE))
    pushed = [
        seg.split("\n")[0]
        for seg in plan.split("PushedFilters")[1:]
    ]
    assert any("lang" in p and "en" in p for p in pushed), pushed
    assert "BroadcastHashJoin" in plan


def test_countmin_probe_join_is_broadcast_and_aggs_are_partial(spark):
    """CMS contract: the probe side joins the kilobyte counter table
    as a broadcast (no shuffle to look up 4 cells per candidate), and
    the counter build itself map-side combines (partial HashAggregate
    below the exchange)."""
    from bow_hunter_pipeline_spark.plans import approx

    plan = _plan(approx.countmin_heavy_hitters(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "HashAggregate" in plan and "Exchange" in plan


def test_attribution_joins_on_user_id_no_cartesian(spark):
    """The lookback band join must execute as an equi-join on user_id
    with the time range as a residual predicate — never a nested-loop
    or cartesian expansion."""
    from bow_hunter_pipeline_spark.plans import events

    plan = _plan(events.attribution_first_last(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "user_id" in plan


def test_q19_disjunctive_join_is_hash_join_with_pushed_envelopes(spark):
    """Q19's OR-of-conjuncts must NOT degrade to a nested loop: the
    common l_partkey=p_partkey conjunct becomes the hash-join key, the
    disjunction evaluates as the join residual, and Catalyst derives
    each side's OR-envelope (quantity bands / brand×size bands) as a
    pushed scan filter on BOTH tables."""
    from bow_hunter_pipeline_spark.plans import tpch

    plan = _plan(tpch.q19_discounted_parts(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # per-side envelopes reached the scans
    li_scan = plan.split("lineitem.parquet", 1)[0]
    assert "l_quantity" in li_scan.split("PushedFilters:")[-1]
    part_scan = plan.split("part.parquet", 1)[0]
    assert "p_brand" in part_scan.split("PushedFilters:")[-1]


def test_greedy_packing_single_python_stage(spark):
    """The stateful fold is ONE grouped-map python stage over the
    source shuffle; the rollup after it is JVM-side HashAggregate."""
    plan = _plan(traindata.greedy_packing(spark, SF_SMOKE))
    # formatted explain names each node once in the tree and once in
    # the details section — count the tree occurrences via node ids
    tree = plan.split("\n\n", 1)[0]
    assert tree.count("FlatMapGroupsInPandas") == 1
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "HashAggregate" in plan


def test_lateral_topn_decorrelates_to_window_group_limit(spark):
    """The correlated LATERAL subquery must plan as a decorrelated
    WindowGroupLimit (map-side partial top-k per customer) feeding a
    hash/merge join — never a per-customer nested loop."""
    from bow_hunter_pipeline_spark.plans import relational

    plan = _plan(relational.lateral_topn_per_customer(spark, SF_SMOKE))
    assert "WindowGroupLimit" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pivot_plans_single_pass_conditional_agg(spark):
    """Pinned-value pivot: one aggregate pass, no distinct-values
    pre-scan (exactly two scans would betray the two-phase pivot)."""
    from bow_hunter_pipeline_spark.plans import relational

    plan = _plan(relational.pivot_priority_matrix(spark, SF_SMOKE))
    tree = plan.split("\n\n", 1)[0]
    assert tree.count("Scan parquet") == 1
    assert "HashAggregate" in plan


def test_ivf_at_rest_search_prunes_cell_partitions(spark):
    """The at-rest IVF search must hit the store with the probe cells
    as PARTITION filters — the scan lists only the probed cells'
    directories, never the whole index."""
    from bow_hunter_pipeline_spark.plans import simsearch

    plan = _plan(simsearch.ivf_index_at_rest(spark, SF_SMOKE))
    store_scan = plan.split("bhps_ivf_store", 1)[0]
    pf = store_scan.rsplit("PartitionFilters:", 1)[-1]
    assert "cell_id" in pf, plan[:1200]


def test_ivf_compacted_store_still_prunes_cell_partitions(spark):
    """Pruning must survive compaction: after the per-cell binpack
    (which the plan function itself asserts leaves ONE file per
    cell), the search scan still carries the probe cells as
    PartitionFilters — compaction pays off the footer-count debt
    without costing the index its partition layout."""
    from bow_hunter_pipeline_spark.plans import simsearch

    plan = _plan(simsearch.ivf_compacted_search(spark, SF_SMOKE))
    store_scan = plan.split("bhps_ivf_store_c", 1)[0]
    pf = store_scan.rsplit("PartitionFilters:", 1)[-1]
    assert "cell_id" in pf, plan[:1200]


def test_ivf_stream_compacted_store_still_prunes_cells(spark):
    """Pruning must survive STREAMING-store compaction too: after the
    two-level binpack folds every ``arrival=N`` dir into the reserved
    ``arrival=-1`` pack partition, the search scan still carries the
    probe cells as PartitionFilters — the mark/pack machinery must not
    cost the store its first-level layout."""
    from bow_hunter_pipeline_spark.plans import simsearch

    plan = _plan(simsearch.ivf_stream_compacted_search(spark, SF_SMOKE))
    store_scan = plan.split("bhps_ivf_stream_c", 1)[0]
    pf = store_scan.rsplit("PartitionFilters:", 1)[-1]
    assert "cell_id" in pf, plan[:1200]


def test_smb_join_only_exchange_is_the_rollup(spark):
    """f_smb_colocated_join's contract: reading both facts co-bucketed
    on the order key leaves the JOIN exchange-free — the executed plan
    carries exchanges only for the final priority rollup, never to
    co-locate the join keys (no Exchange whose partitioning is on
    okey)."""
    from bow_hunter_pipeline_spark.plans import relational
    from tests.conftest import SF_SMOKE

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = relational.smb_colocated_join(spark, SF_SMOKE)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "okey" not in line, f"join key exchange planned: {line}"
    assert "SortMergeJoin" in plan


def test_radius_grid_join_is_equi_join_on_cells(spark):
    """g5_radius_grid_join's contract: the spatial join plans as a
    plain equi join on the cell key (hash or sort-merge), never a
    nested-loop/cartesian over points x queries — the 9-cell explode
    bounds candidates and the distance predicate is a post-join
    filter."""
    from bow_hunter_pipeline_spark.plans import analytics
    from tests.conftest import SF_SMOKE

    plan = _plan(analytics.radius_grid_join(spark, SF_SMOKE))
    assert "Join" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
