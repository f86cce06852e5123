"""Physical-plan quality gates: these assert the plans we'd want at
100 TB, not just correct results — filter/projection pushdown to the
parquet scan, broadcast joins where a side is small, no shuffle in the
extraction stage, partial (map-side) aggregation."""

import pytest
from pyspark.sql import functions as F

from kgw_spark.plans import analytics
from kgw_spark.sources import tpch_kg as KG

SF = "/root/testdata/sf0.001"


def plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_and_projection_pushdown(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.filter(F.col("l_shipdate") > "1996-01-01").select(
        "l_orderkey", "l_extendedprice"
    )
    p = plan(q)
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate" in p
    # column pruning: scan reads only the 3 referenced columns
    read_schema = [ln for ln in p.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" in read_schema and "l_extendedprice" in read_schema
    assert "l_quantity" not in read_schema and "l_discount" not in read_schema


def test_schema_triples_uses_broadcast_joins(spark):
    nodes, edges = KG.kg_nodes(spark, SF), KG.kg_edges(spark, SF)
    p = plan(analytics.schema_triples(nodes, edges))
    assert p.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in p


def test_schema_triples_broadcast_is_size_gated(spark):
    """The A4/A5 broadcast is a *gated* hint: when broadcasting is
    disabled (stand-in for 'node side too large'), the forced hint must
    disappear and the plan falls back to a shuffle join — the shape a
    14.5M-row node table needs (VERDICT r1 #1)."""
    nodes, edges = KG.kg_nodes(spark, SF), KG.kg_edges(spark, SF)
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        p4 = plan(analytics.schema_triples(nodes, edges))
        p5 = plan(analytics.compact_schema(nodes, edges))
        assert "BroadcastHashJoin" not in p4 and "BroadcastExchange" not in p4
        assert "BroadcastHashJoin" not in p5 and "BroadcastExchange" not in p5
        assert "SortMergeJoin" in p4 or "ShuffledHashJoin" in p4
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_broadcast_gate_rejects_large_estimates(spark):
    """A side Catalyst estimates over the threshold must not be hinted
    (the estimate propagates through projections and mapInPandas, so
    this is exactly the 14.5M-row node table case)."""
    from kgw_spark.plans.hints import broadcast_if_small, parse_byte_conf

    assert parse_byte_conf("10485760") == 10485760
    assert parse_byte_conf("64MB") == 64 * 1024 * 1024
    assert parse_byte_conf("1k") == 1024
    assert parse_byte_conf("-1") == -1

    base = spark.range(10)
    # 100M rows x 8 bytes = ~800MB estimate >> 64MB threshold → unhinted
    huge = spark.range(100_000_000).mapInPandas(
        lambda it: (pdf.assign(x=1) for pdf in it), schema="id long, x int"
    )
    assert broadcast_if_small(huge) is huge
    # broadcasting disabled (-1) → never hinted, however small
    small = spark.read.parquet(f"{SF}/nation.parquet")
    assert broadcast_if_small(small, threshold_bytes=-1) is small
    # tiny parquet-backed side does get the hint
    p = plan(base.join(broadcast_if_small(small), base.id == small.n_nationkey))
    assert "BroadcastHashJoin" in p


def test_extraction_has_no_shuffle(spark):
    from kgw_spark.operators.extract import extract_mentions
    from kgw_spark.sources.corpus import corpus_df, generate_corpus

    rows, _ = generate_corpus(n_repos=2, files_per_repo=3)
    p = plan(extract_mentions(corpus_df(spark, rows)))
    assert "Exchange" not in p  # extraction is map-only


def test_q1_partial_aggregation(spark):
    import __spark_entry__ as E

    p = plan(E.queries()["q1_pricing_summary"](spark, SF))
    # partial + final hash aggregate around a single exchange
    assert p.count("HashAggregate") >= 4
    assert len([ln for ln in p.splitlines() if ln.strip().startswith("Exchange") or " Exchange (" in ln]) >= 1


def test_link_broadcast_plan(spark):
    from kgw_spark.operators.extract import extract_mentions
    from kgw_spark.operators.link import link_broadcast
    from kgw_spark.sources.corpus import corpus_df, generate_corpus
    from tests.conftest import alias_df_from_truth

    rows, truth = generate_corpus(n_repos=2, files_per_repo=3)
    m = extract_mentions(corpus_df(spark, rows))
    p = plan(link_broadcast(m, alias_df_from_truth(spark, truth)))
    assert p.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in p


def test_salted_link_plan_is_shuffle_hash(spark):
    from kgw_spark.operators.extract import extract_mentions
    from kgw_spark.operators.link import link_salted
    from kgw_spark.sources.corpus import corpus_df, generate_corpus
    from tests.conftest import alias_df_from_truth

    rows, truth = generate_corpus(n_repos=2, files_per_repo=3)
    m = extract_mentions(corpus_df(spark, rows))
    p = plan(link_salted(m, alias_df_from_truth(spark, truth)))
    assert "ShuffledHashJoin" in p


def test_emb_near_pairs_certified_path_has_no_cartesian(spark):
    """The oracle-certified emb_near_pairs entry must be the LSH-bucketed
    scale path: no cartesian/nested-loop join anywhere in the plan
    (VERDICT r1 #3 flagged the old exact=True crossJoin entry)."""
    import __spark_entry__ as E

    p = plan(E.queries()["emb_near_pairs"](spark, SF))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Co-located join via bucketing: two tables bucketed on the join
    key produce a join plan with NO shuffle exchange (and no Sort when
    the buckets are pre-sorted) — the write-once/join-many shape big
    fact-to-fact joins need at 100 TB."""
    from kgw_spark.sinks.bucketed import read_bucketed, write_bucketed

    left = spark.range(10_000).selectExpr("id AS k", "id * 2 AS v1")
    right = spark.range(10_000).selectExpr("id AS k", "id * 3 AS v2")
    write_bucketed(left, "bk_left", "k", num_buckets=8, sort_by="k",
                   path=str(tmp_path / "bk_left"))
    write_bucketed(right, "bk_right", "k", num_buckets=8, sort_by="k",
                   path=str(tmp_path / "bk_right"))
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = read_bucketed(spark, "bk_left").join(
            read_bucketed(spark, "bk_right"), "k"
        )
        p = plan(j)
        assert "SortMergeJoin" in p
        assert "Exchange" not in p  # co-located: bucket layout reused
        assert j.count() == 10_000
        # the same files read WITHOUT catalog metadata DO shuffle —
        # proves the no-Exchange plan comes from bucketing, not size
        raw = spark.read.parquet(str(tmp_path / "bk_left")).join(
            spark.read.parquet(str(tmp_path / "bk_right")), "k"
        )
        assert "Exchange" in plan(raw)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")


def test_store_partition_pruning(spark, tmp_path):
    """Reading a type-partitioned store table with a type filter must
    prune partitions at the scan (the north rule's partition layout
    paying off: a one-type query touches one directory, not the table)."""
    from kgw_spark.sinks.store import TableStore

    store = TableStore(str(tmp_path / "pp"))
    df = spark.createDataFrame(
        [(f"id{i}", "alpha" if i % 2 else "beta", "{}") for i in range(100)],
        "id string, type string, properties string",
    )
    store.write(df, "nodes", partition_by="type")
    q = store.read(spark, "nodes").filter("type = 'alpha'")
    p = plan(q)
    pf = [ln for ln in p.splitlines() if "PartitionFilters" in ln]
    assert pf and "type" in pf[0] and "alpha" in pf[0]
    # the data filter is NOT re-applied post-scan (pruning is complete)
    assert q.count() == 50


def test_aqe_splits_skewed_join(spark):
    """AQE skew-join handling: a hot key that dwarfs every other
    partition is split at runtime (executed plan marks the join
    skew=true) — the backstop behind the explicit salting helpers."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "8KB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        from pyspark.sql import functions as F2

        left = spark.range(400_000).select(
            F2.when(F2.col("id") % 10 < 9, F2.lit(0))
            .otherwise(F2.col("id"))
            .alias("k"),
            F2.concat(F2.lit("payload_"), F2.col("id")).alias("pad"),
        )
        right = spark.range(50_000).selectExpr("id AS k", "id AS w")
        j = left.join(right, "k").select("k")
        # execute THIS DataFrame's own query execution so the adaptive
        # plan we inspect is the finalized one (a .write/.count spawns a
        # separate execution)
        assert len(j.collect()) > 0
        final = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final
        assert "skew=true" in final, final[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_hash_sample_is_scan_plus_filter(spark):
    """Deterministic sampling must stay a narrow scan + filter — zero
    shuffle, so at 100 TB it fuses into whatever pass reads the corpus."""
    from kgw_spark.operators.sampling import hash_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan(hash_sample(docs, "doc_id", 30))
    assert "Exchange" not in p
    assert "codegen id" in p  # LCG arithmetic stays in whole-stage codegen


def test_contamination_no_cartesian_distinct_before_join(spark):
    """ngram_containment joins eval shingles against DISTINCT train
    shingles (set membership): no cartesian/nested-loop anywhere, and
    the train side is aggregated BEFORE the join so a duplicated
    boilerplate n-gram never multiplies join rows."""
    from kgw_spark.operators.dedup import ngram_containment
    from kgw_spark.operators.sampling import hash_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ev = hash_sample(docs, "doc_id", 10)
    tr = docs.join(ev.select("doc_id"), "doc_id", "left_anti")
    p = plan(ngram_containment(tr, ev, n=5))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    # the distinct (partial+final HashAggregate) sits below the hit join
    assert p.count("HashAggregate") >= 4


def test_neighborhood_among_join_is_broadcast(spark):
    """The r4 neighborhood plan: both among-semi-joins broadcast the
    (checkpointed, hub-bounded) neighbor set — the edge table is never
    shuffled — and the final dedup is over keys only."""
    edges = KG.kg_edges(spark, SF)
    p = plan(analytics.neighborhood(edges, "nation:3"))
    assert p.count("BroadcastHashJoin") >= 2
    assert "LeftSemi" in p
    assert "SortMergeJoin" not in p


def test_k_hop_frontier_joins_are_broadcast(spark):
    """Per-level frontier joins against the cached edge projection use
    broadcast (gated on the known frontier count) — no full-edge
    shuffle at any level; the edge projection is served from the
    persisted cache (InMemoryTableScan in the final plan)."""
    edges = KG.kg_edges(spark, SF)
    out = analytics.k_hop(edges, "customer:1", k=2)
    p = plan(out)
    assert "SortMergeJoin" not in p
    # the visited union assembled from checkpointed per-level
    # frontiers: scans, not shuffles
    assert "Exchange hashpartitioning" not in p


def test_temporal_joins_have_no_nested_loop(spark):
    """The as-of and banded-range temporal join entries must compile to
    pure equi-join plans — no cartesian/nested-loop operator anywhere
    (the naive formulations of both are per-key range cross products)."""
    import __spark_entry__ as E

    for name in ("events_asof_click", "events_range_pairs"):
        p = plan(E.queries()[name](spark, SF))
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name


def test_common_neighbors_plan_shape(spark):
    """kg_common_neighbors must stay on the bounded wedge path: the
    per-node HOF pair expansion (sort_array over collected neighbor
    lists) with no cartesian/nested-loop operator anywhere."""
    import __spark_entry__ as E

    p = plan(E.queries()["kg_common_neighbors"](spark, SF))
    assert "sort_array" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
