"""Plan-contract tests: the physical plans the 100 TB design depends on.

Correctness says what a query returns; these tests pin HOW it executes —
filters reach the parquet scan, projections prune columns, dimension sides
broadcast, top-k avoids a global sort. If a refactor regresses one of these,
the sf0.01 oracle still passes but the 1000-executor run dies; this is the
test layer that catches it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flnr_wins_spark.plans.common import all_queries

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str, execute: bool = False) -> str:
    df = all_queries()[name].fn(spark, SF_DIR)
    if execute:
        # AQE only materializes the final plan (incl. codegen stages) after
        # the query runs
        df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushed_to_scan(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [" in plan
    assert "LessThan(l_shipdate" in plan  # <= '98-09-02 folds to < next day


def test_q1_column_pruning(spark):
    plan = _plan(spark, "q1_pricing_summary")
    # ReadSchema must not include columns the query never touches
    assert "l_partkey" not in plan and "l_suppkey" not in plan


def test_q3_broadcasts_dimensions(spark):
    plan = _plan(spark, "q3_shipping_priority")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # top-k, not global sort + limit


def test_q5_no_cartesian_and_broadcast_dims(spark):
    plan = _plan(spark, "q5_local_supplier_volume")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 3  # supplier/nation/region dims


def test_enrich_broadcasts_lookup(spark):
    plan = _plan(spark, "r4_enrich_left_join")
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan


def test_reject_duplicates_single_shuffle_window(spark):
    plan = _plan(spark, "r7_reject_duplicates")
    # window-count split: exactly one hash exchange (the window partitioning)
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "Window" in plan


def test_reject_unmatched_is_anti_join(spark):
    plan = _plan(spark, "r8_reject_unmatched")
    assert "LeftAnti" in plan


def test_partition_pruning_on_partitioned_layout(spark, tmp_path):
    """Reading a date-partitioned layout with a partition predicate must
    prune at the directory level (PartitionFilters), not scan-and-filter."""
    from pyspark.sql import functions as F

    from flnr_wins_spark.sources import read_table

    path = str(tmp_path / "events_by_date")
    (
        read_table(spark, SF_DIR, "events")
        .withColumn("event_date", F.to_date("ts"))
        .write.partitionBy("event_date")
        .parquet(path)
    )
    df = spark.read.parquet(path).filter(F.col("event_date") == "2024-01-02")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "isnotnull(event_date" in plan or "event_date" in plan.split(
        "PartitionFilters:"
    )[1].split("]")[0]
    # the data filter list must NOT carry the partition predicate
    pushed = plan.split("PushedFilters:")[1].split("]")[0]
    assert "event_date" not in pushed


def test_whole_stage_codegen_everywhere(spark):
    # AQE wraps the plan until runtime, hiding codegen stages from a static
    # explain — disable it here so the stages are visible pre-execution.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for name in ("q1_pricing_summary", "q6_revenue_forecast", "r6_frequency"):
            df = all_queries()[name].fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
            # codegen stages print as '*(n) Operator' in the tree string
            assert "*(1)" in plan, name
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_q9_dims_broadcast_filter_pushed(spark):
    # part/supplier/nation broadcast; the p_name LIKE filter reaches the scan
    plan = _plan(spark, "q9_product_type_profit")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "PushedFilters: [" in plan and "StringContains(p_name,gear)" in plan


def test_q21_single_orderkey_shuffle_reused(spark):
    # The decorrelated exists/not-exists shares the lineitem-orders join
    # subtree between the per-order aggregate and the culprit probe; neither
    # side may plan a per-row correlated subquery (no nested loop).
    plan = _plan(spark, "q21_suppliers_kept_waiting")
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2  # supplier + nation dims


def test_q2_window_min_not_second_scan(spark):
    # The correlated MIN subquery is planned as one window over the scoped
    # join — lineitem must be scanned for the partsupp derivation only.
    plan = _plan(spark, "q2_min_cost_supplier")
    assert "Window" in plan


def test_sample_is_narrow_no_shuffle(spark):
    # Stratified sampling is a pure filter over the scan: no Exchange at all.
    plan = _plan(spark, "x_sample_stratified")
    assert "Exchange" not in plan


def test_seq_packing_shards_the_window(spark):
    # The running sum must window over hash shards, never a single global
    # partition (the one-partition window is the classic 100 TB killer).
    plan = _plan(spark, "x_seq_packing")
    assert "SinglePartition" not in plan


def test_pii_redact_no_python_udf(spark):
    # The scrub chain stays in JVM regexp_replace — no Python worker round-trip.
    plan = _plan(spark, "x_pii_redact")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def _walk_json(arr, i=0):
    node = arr[i]
    children = []
    j = i + 1
    for _ in range(node["num-children"]):
        sub, j = _walk_json(arr, j)
        children.append(sub)
    return (node, children), j


@pytest.mark.slow
def test_no_broadcast_hint_over_grouped_aggregate(spark):
    """Repo-wide scale contract: an explicit broadcast hint must never cover a
    GROUPED aggregate. Grouped-aggregate cardinality follows the key's (and so
    the corpus's) growth — a hint there overrides Spark's 10 MB threshold and
    OOMs at the design scale (the round-1 q17 per-partkey broadcast). Global
    (grouping-free) aggregates are one row by construction and stay allowed
    (q11/q15/q20 scalar thresholds)."""
    import json

    for name, qd in all_queries().items():
        df = qd.fn(spark, SF_DIR)
        arr = json.loads(df._jdf.queryExecution().analyzed().toJSON())
        tree, _ = _walk_json(arr)
        bad = []

        def collect_grouped_aggs(t, out):
            node, children = t
            if node["class"].endswith("logical.Aggregate") and node.get("groupingExpressions"):
                out.append(node["class"])
            for c in children:
                collect_grouped_aggs(c, out)

        def scan(t):
            node, children = t
            if node["class"].endswith("ResolvedHint") and "broadcast" in json.dumps(
                node.get("hints", "")
            ).lower():
                for c in children:
                    collect_grouped_aggs(c, bad)
            for c in children:
                scan(c)

        scan(tree)
        assert not bad, f"{name}: broadcast hint over grouped aggregate(s) {bad}"


def test_simhash_hashes_tokens_once(spark):
    """The signature projection must tokenize + xxhash64 each document ONCE —
    not once per bit (64x), and not again inside a pushed-down isnotnull
    filter (the non-nullable coalesce guard). This is the corpus's hottest
    expression; a recompute here is a ~100x tax at 100 TB."""
    from flnr_wins_spark.operators.dedup import simhash_signatures
    from flnr_wins_spark.sources import read_table

    docs = read_table(spark, SF_DIR, "documents")
    sigs = simhash_signatures(docs, "text", "doc_id")
    plan = sigs._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("xxhash64") == 1
    assert plan.count("split(") == 1
    # joining on the signature must not push a sig-recomputing filter below
    # the projection (simhash is non-nullable, so no isnotnull is inferred)
    joined = sigs.alias("a").join(
        sigs.alias("b"),
        (F.col("a.simhash") == F.col("b.simhash")) & (F.col("a.id") < F.col("b.id")),
    )
    jplan = joined._jdf.queryExecution().optimizedPlan().toString()
    for line in jplan.splitlines():
        if line.lstrip().startswith(("Filter", "+- Filter", ":- Filter")):
            assert "xxhash64" not in line, f"sig recomputed in filter: {line[:120]}"


def test_ann_lsh_dedups_ids_not_vectors(spark):
    """The LSH band join + candidate-pair dedup must carry only (id, bucket) —
    never the embedding arrays (a 768-dim vector is ~200x its id; shuffling
    vectors as dedup keys was the round-1 ANN-LSH scale bug). Vectors re-join
    by id only for surviving pairs."""
    plan = _plan(spark, "x_similarity_ann_lsh")
    for line in plan.splitlines():
        stripped = line.strip(" :+-*")
        if stripped.startswith(("HashAggregate", "Aggregate", "Exchange hashpartitioning")):
            if "query_id" in line and "cand_id" in line:
                assert "_queryv" not in line and "_candv" not in line, line[:160]


def test_bloom_prefilter_broadcast_semi_only(spark):
    """The big side must never shuffle for the prefilter itself: every
    Bloom round plans as a broadcast LEFT SEMI against a bucket list, never
    a sort-merge join (the one shuffle in the query is the final groupBy)."""
    plan = _plan(spark, "x_bloom_prefilter")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3
    assert "LeftSemi" in plan


def test_funnel_filters_pushed_no_cartesian(spark):
    # each stage filters to ONE event type at the scan and joins on user_id
    plan = _plan(spark, "x_funnel_counts")
    assert "CartesianProduct" not in plan
    assert "PushedFilters: [" in plan
    assert "EqualTo(event_type,signup)" in plan


def test_zorder_key_is_narrow_projection(spark):
    # the Morton key is a pure expression over the scan: no exchange at all
    plan = _plan(spark, "x_zorder_layout")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_group_cap_single_window_shuffle(spark):
    # per-group cap = one hash exchange on the group key feeding the rank
    # window; no second shuffle, no global sort
    plan = _plan(spark, "x_group_topk_sample")
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "SinglePartition" not in plan
    assert "Window" in plan


def test_winsorize_ranked_corpus_stays_partitioned(spark):
    """The rank machinery may prefix-sum a partitions-sized (<=n-row) frame
    in one task, but the CORPUS itself must never flow through a global
    window: the ranged data is pinned in a checkpoint (Scan ExistingRDD),
    per-partition windows key on _gr_pid, and offsets/bounds return via
    broadcast. A naive implementation would show 'Window' with an empty
    partition spec over the scan instead."""
    plan = _plan(spark, "x_winsorize")
    assert "Scan ExistingRDD" in plan  # pinned range partitioning
    assert "BroadcastExchange" in plan  # offsets + bounds come back broadcast
    assert "_gr_pid" in plan  # corpus-side windows key on the shard id


def test_fill_forward_running_frame_single_shuffle(spark):
    plan = _plan(spark, "q_window_fill_forward")
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "SinglePartition" not in plan


def test_skew_join_handling_on_in_bare_session(spark):
    """x_dedup_spans (and every non-salted hot-key join) leans on AQE's
    skew-join splitter. Our session.py turns it on explicitly, but the
    driver grades queries in a BARE default-conf session — so the real
    contract is that Spark's SHIPPED DEFAULTS have AQE + skew-join enabled.
    Pin the defaults (not the session values) so an upgrade or conf drift
    that turns either off fails here instead of at 100 TB."""
    sqlconf = spark._jvm.org.apache.spark.sql.internal.SQLConf
    for entry_name in ("ADAPTIVE_EXECUTION_ENABLED", "SKEW_JOIN_ENABLED"):
        entry = getattr(sqlconf, entry_name)()
        assert entry.defaultValueString() == "true", entry.key()
    # and the operator's own session (what bench/tests run under) agrees
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


@pytest.mark.slow
def test_no_row_at_a_time_python_udf_anywhere(spark):
    """Repo-wide scale contract: NO registered query may plan a row-at-a-time
    Python UDF (BatchEvalPython) — the 10-100x-slower path. Arrow-batched
    pandas UDFs (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas) are
    the sanctioned Python escape hatch and stay allowed."""
    offenders = []
    for name, qd in all_queries().items():
        df = qd.fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "BatchEvalPython" in plan:
            offenders.append(name)
    assert not offenders, f"row-at-a-time Python UDFs in: {offenders}"


def test_fuzzy_join_no_cartesian_blocked_equijoin(spark):
    """Round-4 linkage contract: candidate generation must be an equi-join
    on the blocking key (SortMerge/Hash), NEVER a cartesian/BNL — the whole
    point of blocking is avoiding |L|x|R| at 100 TB."""
    plan = _plan(spark, "x_fuzzy_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_phrase_search_filters_terms_before_exchange(spark):
    """Phrase terms must filter the postings while still narrow: the plan's
    Filter on the term literals sits below the first Exchange."""
    plan = _plan(spark, "x_search_phrase")
    assert "slow" in plan  # term literal present as a filter
    filter_pos = plan.index("slow")
    first_exchange_above = plan.rfind("Exchange", 0, filter_pos)
    # the term filter appears in the scan-side (post-Exchange-text) section;
    # cheaper robust check: no cartesian, and the explode feeds a Filter
    assert "CartesianProduct" not in plan
    assert first_exchange_above == -1 or "Generate" in plan


def test_tfidf_pairs_no_cartesian(spark):
    """The postings self-join must be a hash/sort-merge equi-join on the
    term; the only nested-loop joins allowed are the broadcast-of-scalar
    (1-row corpus-count) crossJoins."""
    plan = _plan(spark, "x_dedup_tfidf")
    assert "CartesianProduct" not in plan
    assert "Join [term" in plan or "Join [a" in plan or "HashJoin" in plan


def test_random_projection_zero_shuffle(spark):
    plan = _plan(spark, "x_random_projection")
    assert "Exchange" not in plan  # pure narrow map over the scan


def test_classifier_models_ride_broadcast(spark):
    """Perceptron weights and NB model tables must attach by broadcast —
    the corpus-sized side never shuffles on a model key."""
    for name in ("x_classify_perceptron", "x_classify_nb_langid"):
        plan = _plan(spark, name)
        assert "BroadcastExchange" in plan, name


def test_knn_and_hard_negatives_broadcast_queries(spark):
    for name in ("x_knn_classify", "x_hard_negatives"):
        plan = _plan(spark, name)
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, name
        # candidate corpus must not shuffle pre-score: only the k-bounded
        # result reaches the rank window
        assert "CartesianProduct" not in plan, name


def test_weighted_sample_is_takeordered(spark):
    plan = _plan(spark, "x_weighted_sample")
    assert "TakeOrderedAndProject" in plan  # no global sort


def test_triangle_and_kcore_no_cartesian(spark):
    """Graph contracts: the wedge-closing join and the peel semi-joins must
    be equi-joins (hash/sort-merge) — degree orientation is pointless if the
    closing step goes quadratic."""
    for name in ("x_triangle_count", "x_kcore"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_sorted_neighborhood_blocked_equijoin(spark):
    """SNM candidates meet through the rank-block equi-join; the |rn diff|
    predicate is a post-join filter, never the join itself."""
    plan = _plan(spark, "x_sorted_neighborhood")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_maxmatch_vocab_join_broadcasts(spark):
    """The greedy rounds join in-flight words against the vocabulary: the
    vocab side (~top_words + alphabet rows) must broadcast — shuffling the
    word table per round would dominate at corpus scale."""
    plan = _plan(spark, "x_tokenize_maxmatch")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_dq_and_profile_no_python(spark):
    """The one-pass quality/profile aggregates stay entirely JVM-side."""
    for name in ("x_dq_expectations", "x_profile_columns"):
        plan = _plan(spark, name)
        assert "EvalPython" not in plan, name
        assert "Exchange" in plan  # the single agg shuffle


def test_embedding_covariance_no_rowlevel_explode(spark):
    """The covariance fit must keep its n*dim^2 work inside the Arrow
    batches (one MapInPandas over the scan, partials-only shuffle) — a
    Generate/explode node here means the row-level blow-up reached the
    exchange, which is exactly what the operator exists to avoid."""
    plan = _plan(spark, "x_embedding_covariance")
    assert "MapInPandas" in plan
    assert "Generate" not in plan  # no explode of (row, i, j)


def test_jpeg_entries_are_arrow_batched(spark):
    for name in ("x_multimodal_jpeg_decode", "x_multimodal_jpeg_progressive"):
        plan = _plan(spark, name)
        assert "MapInPandas" in plan, name
        assert "BatchEvalPython" not in plan, name  # no row-at-a-time UDF


def test_llm_corpus_e2e_stays_jvm_side(spark):
    """The curation flagship must run without any Python-row evaluation:
    rules, dedup, mixture, and manifest are all JVM expression code."""
    plan = _plan(spark, "x_llm_corpus_e2e")
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan  # nothing needs Arrow here either


def test_llm_corpus_e2e_never_checkpoints_full_corpus(spark):
    """The full-corpus multi-consumer pin must be a spillable CACHE
    (lineage intact, evictable, recomputable on executor loss), never a
    lineage-truncating localCheckpoint of the whole input — at 100 TB
    that is a storage bill and a fault-tolerance hole. Only the
    post-filter+dedup ``kept`` set may checkpoint."""
    from flnr_wins_spark.plans.common import all_queries

    # patch the CONCRETE class (pyspark 4 routes pyspark.sql.DataFrame to
    # an abstract base; instances are classic.dataframe.DataFrame)
    cls = type(spark.range(1))
    calls = []
    orig = cls.localCheckpoint

    def spy(self, eager=True):
        calls.append(self._jdf.queryExecution().analyzed().toString())
        return orig(self, eager)

    cls.localCheckpoint = spy
    try:
        all_queries()["x_llm_corpus_e2e"].fn(spark, SF_DIR)
    finally:
        cls.localCheckpoint = orig
    assert len(calls) == 1  # kept only
    # the checkpointed plan is the FILTERED + DEDUPED corpus (quality-rule
    # filter + min-id survivor window — r16 removed the rules re-join via
    # quality_rules keep= passthrough), not the bare scan+repartition of
    # the raw input — and the repartitioned scan inside it is a plain
    # (cache-backed) subtree with lineage, so it appears UNDER the
    # filter/window rather than being the root
    assert "Window" in calls[0] and "Filter" in calls[0]
    assert not calls[0].lstrip().startswith("Repartition")


def test_corpus_mixture_quotas_broadcast(spark):
    """Mixture quotas are a per-source handful of rows — they must attach
    to the ranked corpus by broadcast, never a shuffled join."""
    plan = _plan(spark, "x_corpus_mixture")
    assert "BroadcastHashJoin" in plan


def test_merge_evolve_single_full_outer_join(spark):
    """MERGE with schema evolution is ONE full-outer key join plus a
    column-wise projection — never per-column joins, never a cartesian."""
    plan = _plan(spark, "x_merge_evolve")
    assert "CartesianProduct" not in plan
    assert plan.count("FullOuter") == 1


def test_warc_ingest_is_arrow_batched(spark):
    """WARC record decode must run Arrow-batched (mapInPandas), never
    row-at-a-time Python."""
    plan = _plan(spark, "x_warc_ingest")
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_rerank_cross_broadcasts_query_side(spark):
    """The corpus side must never shuffle into a join against a handful
    of queries: query frame and query-vocab df/idf frames all broadcast."""
    plan = _plan(spark, "x_rerank_cross")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_search_e2e_limits_before_rank(spark):
    """Every global ranking in the search pipeline must be a
    TakeOrderedAndProject (per-partition heaps) feeding a k-row rank
    window — never a corpus-wide Sort into an unpartitioned window. A
    bare Sort node here is the plan that funnels every matching doc
    through one task at 100 TB."""
    import re

    plan = _plan(spark, "x_search_e2e")
    assert "TakeOrderedAndProject" in plan
    # no standalone Sort exec node anywhere (the only "Sort" text allowed
    # is inside TakeOrderedAndProject's orderBy= spec)
    assert not re.search(r"\bSort \[", plan), plan
    # every rank window is fed by a limit: equal node counts
    assert plan.count("Window ") <= plan.count("TakeOrderedAndProject")


def test_minhash_estimate_pins_only_pairs(spark):
    """The signature table is O(corpus-rows) and must stay a spillable
    persist (lineage intact); only the duplicate-count-sized verified
    pair set may localCheckpoint — same doctrine as x_llm_corpus_e2e."""
    from flnr_wins_spark.plans.common import all_queries

    cls = type(spark.range(1))
    calls = []
    orig = cls.localCheckpoint

    def spy(self, eager=True):
        calls.append(self._jdf.queryExecution().analyzed().toString())
        return orig(self, eager)

    cls.localCheckpoint = spy
    try:
        all_queries()["x_dedup_minhash_estimate"].fn(spark, SF_DIR)
    finally:
        cls.localCheckpoint = orig
    assert len(calls) == 1  # the pair set only
    # the pinned plan is the post-join filtered pair set, never the bare
    # signature aggregate
    assert "Join" in calls[0]


def test_bm25_persisted_probe_pushes_term_filter_to_index_scan(spark):
    """Serving from the persisted inverted index must push the query-term
    IN predicate into the postings parquet scan (row-group skipping over
    the index), and keep the TakeOrdered top-k — a probe that scans the
    whole index defeats the point of persisting it."""
    plan = _plan(spark, "x_search_bm25_persisted")
    assert "PushedFilters: [In(term" in plan
    assert "TakeOrderedAndProject" in plan


def test_kaplan_meier_windows_are_group_sharded(spark):
    """Both KM windows (reverse at-risk cumsum, forward ln-sum) partition
    by the group key — a SinglePartition window would serialize the whole
    event-time grid through one task at scale."""
    plan = _plan(spark, "x_kaplan_meier")
    assert "SinglePartition" not in plan


def test_target_encode_margins_broadcast(spark):
    """Category/fold margin frames are category-bounded — they must
    broadcast back onto the row projection, never shuffle the fact side
    into a sort-merge join."""
    plan = _plan(spark, "x_target_encode")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_drift_psi_is_counts_sized_after_shuffle(spark):
    """PSI's only real work is the two bin-count aggregates; everything
    after operates on bins-sized frames (broadcast total attach)."""
    plan = _plan(spark, "x_drift_psi")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_corpus_shard_is_one_exchange_no_python(spark):
    """Shard export layout: the hash projection is pure JVM (md5/conv —
    no Python anywhere), and the only shuffle is the single hash
    Exchange feeding the per-shard rank window. A second Exchange or a
    BatchEvalPython here would double the cost of every corpus export."""
    plan = _plan(spark, "x_corpus_shard")
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in plan  # no global sort


def test_ptable_incremental_mv_join_is_aggregate_sized(spark):
    """The MV refresh's only join is prev-aggregate vs delta-aggregate on
    the MV key (full outer) — never a join against the fact table; the
    delta side is a pure union of changed-partition scans (no key join,
    unchanged rows cancel)."""
    plan = _plan(spark, "x_ptable_incremental_mv")
    assert plan.count("FullOuter") == 1
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_bloom_point_read_scans_pruned_partitions_only(spark):
    """The graded bloom entry's returned plan must scan the manifest-
    pruned partition set, not the whole table: with a unique probe key
    the scan covers exactly ONE stage partition directory (plus the
    re-filter on the real column)."""
    import re

    plan = _plan(spark, "x_ptable_bloom_point")
    # read_ptable attaches each scanned partition's value as a literal
    # projection, so the set of "<VALUE> AS c_mktsegment" literals IS the
    # scanned partition set (the Location path is truncated in toString
    # now that scratch paths are longer, so don't regex the path)
    dirs = set(re.findall(r"\[?([A-Z]+) AS c_mktsegment", plan))
    assert len(dirs) == 1, (dirs, plan[:1500])
    assert "BatchEvalPython" not in plan


def test_bucketed_join_single_exchange(spark):
    """The co-located join must read both bucketed scans with NO
    exchange — the only shuffle in the whole plan is the 5-row priority
    aggregate's. A second hash Exchange means the bucket spec was not
    picked up and the join shuffled both fact sides anyway."""
    plan = _plan(spark, "x_bucketed_join")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "SortMergeJoin" in plan


def test_holt_grouped_is_arrow_batched_per_series(spark):
    """The grouped recurrence must run as applyInPandas (one Arrow batch
    per series), never row-at-a-time Python — and the series order comes
    from a window keyed by the same group, so the shuffle is shared."""
    plan = _plan(spark, "x_holt_forecast_grouped")
    assert "FlatMapGroupsInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_holt_single_series_has_no_driver_collect(spark):
    """VERDICT r7 item 4: the single-series Holt entry must route
    through the distributed operator — the plan shows the Arrow-batched
    recurrence (FlatMapGroupsInPandas) reading straight from the
    parquet aggregate, with NO driver round-trip (a collect +
    createDataFrame would surface as a LocalTableScan / ExistingRDD
    scan instead of the parquet scan feeding the recurrence)."""
    plan = _plan(spark, "x_holt_forecast")
    assert "FlatMapGroupsInPandas" in plan
    assert "LocalTableScan" not in plan
    assert "ExistingRDD" not in plan
    assert "BatchEvalPython" not in plan


def test_join_advisor_broadcasts_the_metadata_chosen_side(spark):
    """VERDICT r7 item 2: the statistics consumer. The graded entry's
    executed plan must contain the BROADCAST hash join the advisor chose
    from manifest bytes/rows/NDV — a SortMergeJoin here means the advice
    was computed but not enforced."""
    plan = _plan(spark, "x_ptable_join_advisor")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
    assert "SortMergeJoin" not in plan


def test_dpp_join_scan_covers_only_bloom_survivors(spark):
    """The DPP entry's fact scan must enumerate ONLY the partitions the
    bloom probes kept — every kb= directory in the plan is a survivor,
    and at least some partitions are absent (the pruning bit)."""
    import re

    from flnr_wins_spark.plans import common
    from flnr_wins_spark.sources.ptable import prune_partitions_eq

    df = all_queries()["x_ptable_dpp_join"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the Location strings in toString truncate at ~100 chars (and the
    # cached-fixture dir name lengthened the path), so enumerate the
    # scanned partitions from inputFiles() — full paths, never elided
    scanned = {m for f in df.inputFiles() for m in re.findall(r"kb=(-?\d+)", f)}
    path = common.fixture_path("ptable_dpp", SF_DIR) + "/tbl"
    kept = set()
    for k in (1, 2, 3):
        kept |= set(prune_partitions_eq(spark, path, "o_custkey", k))
    assert scanned and scanned <= kept, (scanned, kept)
    assert len(scanned) < 32
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


@pytest.mark.slow
def test_stream_lakehouse_scan_covers_only_zone_survivors(spark):
    """After two streamed merges, the graded range probe's scan must
    enumerate only zone-map survivor partitions (negative-key insert
    partitions and out-of-range buckets are absent from the plan)."""
    import re

    plan = _plan(spark, "x_stream_lakehouse_prune")
    scanned = {int(m) for m in re.findall(r"kb=(-?\d+)", plan)}
    assert scanned, plan[:2000]
    assert all(v >= 0 for v in scanned), scanned  # inserts pruned away
    assert len(scanned) <= 4  # a 2-bucket-wide probe (+ boundary slack)


def test_advisor_colocated_join_is_exchange_free(spark):
    """The graded colocated entry's plan must contain exactly ONE
    Exchange (the 5-row aggregate's) — the metastore-chosen bucketed
    strategy leaves the join itself shuffle-free."""
    plan = _plan(spark, "x_advisor_colocated")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "SortMergeJoin" in plan


def test_dedup_index_probe_reads_stored_index(spark):
    """The incremental-dedup entry's returned plan must read the
    PERSISTED index (a parquet scan whose ReadSchema carries the stored
    shset/sig columns) rather than re-signing the base corpus — the
    whole point is O(new) signing work at probe time."""
    plan = _plan(spark, "x_dedup_index_incremental")
    import re

    schemas = re.findall(r"ReadSchema: [^\n]*", plan)
    # the stored index is even COLUMN-PRUNED per consumer: the banding
    # side reads (id, sig) only, the verify side (id, shset) only —
    # neither re-reads text, i.e. no re-signing of the base corpus
    assert any("sig" in s and "text" not in s for s in schemas), schemas
    assert any("shset" in s and "text" not in s for s in schemas), schemas
    assert "BatchEvalPython" not in plan


def test_cached_fixture_builds_once_and_survives_name_collisions(tmp_path):
    """VERDICT r9 task 4 + ADVICE r9: cached_fixture must build once per
    (name, sf_dir), and a THIRD distinct sf_dir sharing a basename must
    never let the versioned-run GC reclaim the first cached build (the
    old basename-keyed scratch name aliased all three onto one run
    counter, so run-3 deleted run-1)."""
    import os

    from flnr_wins_spark.plans import common

    calls = []

    def builder(d):
        calls.append(d)
        with open(d + "/x", "w") as f:
            f.write("1")

    p1, p2, p3 = (str(tmp_path / p / "sfX") for p in ("p1", "p2", "p3"))
    a1 = common.cached_fixture("cfx_test", p1, builder)
    a2 = common.cached_fixture("cfx_test", p1, builder)
    assert a1 == a2 and len(calls) == 1  # build-once reuse
    b = common.cached_fixture("cfx_test", p2, builder)
    c = common.cached_fixture("cfx_test", p3, builder)
    assert len(calls) == 3 and len({a1, b, c}) == 3
    # the first build is still on disk after two same-basename siblings
    assert os.path.exists(a1 + "/x") and os.path.exists(b + "/x")
    assert common.fixture_path("cfx_test", p1) == a1


def test_graded_fixture_entries_reuse_cached_builds(spark):
    """The fixture-pure graded entries must pay their ptable commits ONCE
    per process: a second invocation reuses the cached build (run counter
    stays at 1), so bench's min-of-2 and driver regrades measure the
    probe, not the fixture."""
    from flnr_wins_spark.plans import common

    qs = all_queries()
    for name, fixture in (
        ("x_ptable_join_advisor", "adv_tables"),
        ("x_ptable_dpp_join", "ptable_dpp"),
    ):
        qs[name].fn(spark, SF_DIR).count()
        qs[name].fn(spark, SF_DIR).count()
        runs = [
            v for k, v in common._SCRATCH_RUNS.items()
            if k.startswith(fixture + "@")
        ]
        assert runs == [1], (name, runs)


def test_auto_read_entry_scans_only_pruned_partitions_and_broadcasts(spark):
    """x_advisor_auto_read's executed read must touch ONLY the partitions
    the sidecars kept — two year dirs on the fact (zone-map range), one
    segment dir on the dim (hive point) — and the advised strategy must
    really execute as a broadcast join."""
    import re

    df = all_queries()["x_advisor_auto_read"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    files = df.inputFiles()
    fact_years = {m for f in files for m in re.findall(r"oy=(\d+)", f)}
    assert fact_years == {"1995", "1996"}, fact_years
    segs = {m for f in files for m in re.findall(r"c_mktsegment=(\w+)", f)}
    assert segs == {"BUILDING"}, segs
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_skew_sidecar_entry_salts_only_the_hot_key(spark):
    """x_skew_sidecar_join must execute as the hot/tail split: a salted
    join (xxhash64 salt) unioned with a plain tail join — and never a
    row-at-a-time Python fallback."""
    plan = _plan(spark, "x_skew_sidecar_join")
    assert "xxhash64" in plan, plan[:2000]
    assert "Union" in plan
    assert "BatchEvalPython" not in plan


def test_grid_skew_entry_fans_out_both_sides(spark):
    """x_grid_skew_join must execute the 2-D grid: BOTH sides of the hot
    slice carry an explode fan-out (two Generate nodes — the 1-D salted
    path has exactly one), joined with the plain tail via Union, with
    deterministic xxhash64 cell assignment and no Python fallback. The
    advice itself must flag the key hot on BOTH sides (the graded
    literals pin n_hot_left = n_hot_right = 1)."""
    plan = _plan(spark, "x_grid_skew_join")
    assert plan.count("Generate") == 2, plan[:2000]
    assert "xxhash64" in plan
    assert "Union" in plan
    assert "BatchEvalPython" not in plan


def test_grid_skew_left_entry_decomposes_exactly(spark):
    """x_grid_skew_left must execute the LEFT decomposition: the grid
    inner join (two Generate fan-outs) plus the null-padded complement
    via a LeftAnti probe against the dim's distinct keys — never a
    replicated outer join, never a Python fallback."""
    plan = _plan(spark, "x_grid_skew_left")
    assert plan.count("Generate") == 2, plan[:2000]
    assert "LeftAnti" in plan
    assert "xxhash64" in plan
    assert "Union" in plan
    assert "BatchEvalPython" not in plan


def test_grid_skew_full_entry_carries_both_probes(spark):
    """x_grid_skew_full must execute the FULL decomposition: the grid
    inner join (two Generate fan-outs) plus BOTH null-pad complements
    via two LeftAnti probes (left vs the dim's distinct keys, the
    transpose vs the fact's) — never a replicated outer join, never a
    Python fallback."""
    plan = _plan(spark, "x_grid_skew_full")
    assert plan.count("Generate") == 2, plan[:2000]
    assert plan.count("LeftAnti") >= 2
    assert "xxhash64" in plan
    assert "Union" in plan
    assert "BatchEvalPython" not in plan


def test_right_hot_left_entry_takes_degenerate_grid(spark):
    """x_right_hot_left_join must execute the (1 x N) grid: one-sided
    salting of the heavy right (xxhash64 cell assignment, the two grid
    explodes — the left one degenerate), the null-padded complement via
    a LeftAnti probe against the fact's distinct keys, the plain tail
    via Union, and no Python fallback."""
    plan = _plan(spark, "x_right_hot_left_join")
    assert plan.count("Generate") == 2, plan[:2000]
    assert "LeftAnti" in plan
    assert "xxhash64" in plan
    assert "Union" in plan
    assert "BatchEvalPython" not in plan
