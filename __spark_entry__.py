"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship A4 schema query on sf0.001.
``queries()`` exposes one entry per implemented operator from
SURVEY.md §2 (plus the training-data operator suite); each callable
takes (spark, sf_dir) and returns a DataFrame. ``oracle_sql()`` gives
the DuckDB-executable ANSI-SQL twin for every SQL-expressible query;
genuinely non-SQL operators (LSH families, the full KG pipeline) are
exposed without an oracle → rows-only check.

Numeric discipline (so value-hashes match across engines): money
aggregates are summed as DECIMAL(18,2) (exact, order-independent) and
only then cast to double and rounded; ratio outputs are rounded to 6;
no raw timestamps are returned (formatted to strings).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kgw_spark.functions import text as TX
from kgw_spark.operators import dedup as DD
from kgw_spark.operators import similarity as SIM
from kgw_spark.operators.canon import connected_components
from kgw_spark.plans import analytics as A
from kgw_spark.sources import tpch_kg as KG

# ---------------------------------------------------------------------------
# shared SQL fragments
# ---------------------------------------------------------------------------
_STOP = ", ".join(f"'{w}'" for w in TX.STOPWORDS)
_TOKS = r"string_split_regex(trim(text), '\s+')"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_PYFILES_SHIPPED: set[int] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make kgw_spark importable on the session's Python workers
    regardless of the harness's cwd/PYTHONPATH: zip the package once
    and addPyFile it to the live SparkContext. Only needed by queries
    that run Python UDFs (mapInPandas extraction)."""
    key = id(spark.sparkContext)
    if key in _PYFILES_SHIPPED:
        return
    import os
    import tempfile
    import zipfile

    pkg_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "kgw_spark")
    zip_path = os.path.join(tempfile.gettempdir(), "kgw_spark_pyfiles.zip")
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path + ".tmp", "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        zf.write(full, rel)
        os.replace(zip_path + ".tmp", zip_path)
    spark.sparkContext.addPyFile(zip_path)
    _PYFILES_SHIPPED.add(key)


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: A4 schema detection over the KG derived from sf0.001."""
    sf = "/root/testdata/sf0.001"
    return A.schema_triples(KG.kg_nodes(spark, sf), KG.kg_edges(spark, sf))


# ---------------------------------------------------------------------------
# KG operator queries (SURVEY §2.3 / §2.2 / §2.7)
# ---------------------------------------------------------------------------
def q_kg_statistics(spark, sf_dir):
    nodes, edges = KG.kg_nodes(spark, sf_dir), KG.kg_edges(spark, sf_dir)
    n = nodes.agg(
        F.count(F.lit(1)).alias("num_nodes"),
        F.countDistinct("type").alias("num_node_types"),
    )
    e = edges.agg(
        F.count(F.lit(1)).alias("num_edges"),
        F.countDistinct("type").alias("num_edge_types"),
    )
    return n.crossJoin(e).select(
        "num_nodes", "num_edges", "num_node_types", "num_edge_types"
    )


def q_kg_node_type_counts(spark, sf_dir):
    return (
        KG.kg_nodes(spark, sf_dir)
        .groupBy("type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_kg_edge_type_counts(spark, sf_dir):
    return (
        KG.kg_edges(spark, sf_dir)
        .groupBy("type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_kg_schema_triples(spark, sf_dir):
    return A.schema_triples(KG.kg_nodes(spark, sf_dir), KG.kg_edges(spark, sf_dir))


def q_kg_compact_schema(spark, sf_dir):
    return A.compact_schema(KG.kg_nodes(spark, sf_dir), KG.kg_edges(spark, sf_dir))


def q_kg_neighborhood(spark, sf_dir):
    return A.neighborhood(KG.kg_edges(spark, sf_dir), "nation:3")


def q_kg_triple_dedup(spark, sf_dir):
    edges = KG.kg_edges(spark, sf_dir)
    return (
        edges.filter(F.col("type").isin("contains", "supplied_by"))
        .select(
            F.col("source_id").alias("subj"),
            F.col("type").alias("pred"),
            F.col("target_id").alias("obj"),
        )
        .dropDuplicates(["subj", "pred", "obj"])
    )


def q_kg_node_union(spark, sf_dir):
    edges = KG.kg_edges(spark, sf_dir)
    ids = (
        edges.select(F.col("source_id").alias("id"))
        .union(edges.select(F.col("target_id").alias("id")))
        .distinct()
    )
    return ids.select(
        "id", F.lower(F.split(F.col("id"), ":", 2).getItem(0)).alias("node_type")
    )


def q_kg_enrich_broadcast(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    enriched = cust.join(
        F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"]
    ).join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
    return enriched.groupBy(
        F.col("r_name").alias("region_name"),
        F.col("c_mktsegment").alias("mktsegment"),
    ).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.min("c_acctbal"), 2).alias("min_acctbal"),
        F.round(F.max("c_acctbal"), 2).alias("max_acctbal"),
    )


def q_kg_connected_components(spark, sf_dir):
    nation = _t(spark, sf_dir, "nation")
    supplier = _t(spark, sf_dir, "supplier")
    pairs = nation.select(
        F.concat(F.lit("nation:"), F.col("n_nationkey").cast("string")).alias("u"),
        F.concat(F.lit("region:"), F.col("n_regionkey").cast("string")).alias("v"),
    ).union(
        supplier.select(
            F.concat(F.lit("supplier:"), F.col("s_suppkey").cast("string")).alias("u"),
            F.concat(F.lit("nation:"), F.col("s_nationkey").cast("string")).alias("v"),
        )
    )
    return connected_components(pairs)


# ---------------------------------------------------------------------------
# TPC-H-style analytics (bench headliners; exercise joins/aggs/windows)
# ---------------------------------------------------------------------------
def q_q1_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "2000-12-01")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).alias("_sq"),
        F.sum(price).alias("_sp"),
        F.sum(price * (F.lit(1.0).cast("decimal(18,2)") - disc)).alias("_sd"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        F.round(F.col("_sq").cast("double"), 2).alias("sum_qty"),
        F.round(F.col("_sp").cast("double"), 2).alias("sum_base_price"),
        F.round(F.col("_sd").cast("double"), 4).alias("sum_disc_price"),
        F.round(F.col("_sq").cast("double") / F.col("count_order"), 6).alias("avg_qty"),
        "count_order",
    )


def q_q3_shipping_priority(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1996-06-30")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1996-06-30")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).join(
        F.broadcast(c), o["o_custkey"] == c["c_custkey"]
    )
    return (
        j.groupBy("l_orderkey", "o_orderpriority")
        .agg(
            F.round(
                F.sum(price * (F.lit(1.0).cast("decimal(18,2)") - disc)).cast("double"),
                4,
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q_q5_region_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    )
    return j.groupBy(F.col("r_name").alias("region_name")).agg(
        F.round(
            F.sum(price * (F.lit(1.0).cast("decimal(18,2)") - disc)).cast("double"), 4
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


def q_q6_forecast_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    sel = li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_quantity") < 24)
    )
    return sel.agg(
        F.round(F.sum(price * disc).cast("double"), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q_q10_top_customers(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
    )
    return (
        j.groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("n_name").alias("nation"),
        )
        .agg(
            F.round(
                F.sum(price * (F.lit(1.0).cast("decimal(18,2)") - disc)).cast(
                    "double"
                ),
                4,
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("custkey"))
        .limit(20)
    )


def q_events_json_props(spark, sf_dir):
    """JSON property extraction over the events.props column (T9-style
    parse; exercises get_json_object against DuckDB's json functions)."""
    ev = _t(spark, sf_dir, "events")
    device = F.get_json_object(F.col("props"), "$.k")
    return (
        ev.groupBy(device.alias("device"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 6).alias("min_value"),
        )
    )


def q_kg_edge_rollup(spark, sf_dir):
    """ROLLUP over the KG schema dims — subtotal/grand-total rows
    (beyond the reference's plain GROUP BYs)."""
    edges = KG.kg_edges(spark, sf_dir)
    src_kind = F.split(F.col("source_id"), ":", 2).getItem(0)
    tgt_kind = F.split(F.col("target_id"), ":", 2).getItem(0)
    return (
        edges.select(
            src_kind.alias("source_kind"), tgt_kind.alias("target_kind")
        )
        .rollup("source_kind", "target_kind")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_top_order_per_customer(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
        )
    )


# ---------------------------------------------------------------------------
# events: sessionization + windowed aggregation
# ---------------------------------------------------------------------------
def q_events_sessionize(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet ts is TIMESTAMP_NTZ; session TZ is pinned UTC so the cast
    # to TIMESTAMP is lossless and unix_micros applies
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = micros - F.unix_micros(F.lag(F.col("ts").cast("timestamp")).over(w))
    flagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


def q_events_hourly(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
            "hour"
        ),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value"), 6).alias("min_value"),
        F.round(F.max("value"), 6).alias("max_value"),
    )


# ---------------------------------------------------------------------------
# training-data operators: text analysis, dedup, similarity
# ---------------------------------------------------------------------------
def q_docs_text_stats(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    c = F.col("text")
    return docs.select(
        "doc_id",
        TX.token_count(c).alias("n_tokens"),
        F.round(TX.stopword_ratio(c), 6).alias("stopword_ratio"),
        TX.fingerprint(c).alias("fingerprint"),
        TX.lang_id(c).alias("lang_guess"),
        TX.quality_score(c).alias("quality"),
    )


def q_docs_prefix_dedup(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), "\\s+")
    prefix = F.concat_ws(" ", F.slice(toks, 1, 3))
    groups = docs.select(F.col("doc_id"), prefix.alias("prefix")).groupBy(
        "prefix"
    ).agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_docs"))
    return groups.filter(F.col("n_docs") >= 2).select("prefix", "keep_id", "n_docs")


def q_docs_exact_dup_pairs(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return DD.exact_duplicates(docs).select("keep_id", "dup_id")


def q_docs_ngram_jaccard(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return DD.ngram_jaccard_pairs(docs, n=3, threshold=0.2)


def q_emb_cosine_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    q = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    return SIM.cosine_topk(emb, q, k=10)


def q_emb_near_pairs(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.cosine_near_pairs(emb, threshold=0.3, exact=True)


# ---------------------------------------------------------------------------
# non-SQL-expressible operators → rows-only checks (no oracle entry)
# ---------------------------------------------------------------------------
def q_docs_minhash_lsh(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return DD.minhash_lsh_pairs(docs, n=3, num_perm=64, bands=16, threshold=0.2)


def q_docs_simhash_pairs(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return DD.simhash_near_pairs(docs, max_hamming=6)


def q_emb_lsh_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    q = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    return SIM.lsh_topk(emb, q, k=10, n_planes=6, multiprobe=2)


def q_emb_ivf_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    q = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    return SIM.ivf_topk(emb, q, k=10, n_cells=16, n_probe=4)


def q_kg_pipeline_triples(spark, sf_dir):
    """The full north-rule pipeline (extract → link → canonicalize →
    dedup) on the deterministic synthetic source-code corpus; returns
    the canonical triple set. Corpus size scales with sf via lineitem
    row count so the work tracks the chosen scale factor."""
    import tempfile

    from kgw_spark.model import triple_view
    from kgw_spark.plans.pipeline import run_pipeline
    from kgw_spark.sinks.store import TableStore
    from kgw_spark.sources.corpus import corpus_df, generate_corpus

    _ship_package(spark)
    n_li = _t(spark, sf_dir, "lineitem").count()
    n_repos = max(4, min(64, n_li // 2000))
    rows, truth = generate_corpus(n_repos=n_repos, files_per_repo=20, seed=42)
    adf = spark.createDataFrame(
        [
            {"alias_id": a, "canonical_id": c, "score": float(s)}
            for a, (c, s) in truth.alias_dict.items()
        ],
        schema="alias_id string, canonical_id string, score double",
    )
    store = TableStore(tempfile.mkdtemp(prefix="kgq_"))
    res = run_pipeline(
        spark, corpus_df(spark, rows), adf, store, input_fingerprint="entryq"
    )
    return triple_view(res.edges)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # KG analytics & transform operators (SURVEY §2)
        "kg_statistics": q_kg_statistics,                    # A1+A2
        "kg_node_type_counts": q_kg_node_type_counts,        # A3
        "kg_edge_type_counts": q_kg_edge_type_counts,        # A3
        "kg_schema_triples": q_kg_schema_triples,            # A4
        "kg_compact_schema": q_kg_compact_schema,            # A5
        "kg_neighborhood": q_kg_neighborhood,                # A7
        "kg_triple_dedup": q_kg_triple_dedup,                # T5
        "kg_node_union": q_kg_node_union,                    # T3+T4+T6
        "kg_enrich_broadcast": q_kg_enrich_broadcast,        # T7
        "kg_connected_components": q_kg_connected_components,  # §2.7 canon
        # analytics workloads
        "q1_pricing_summary": q_q1_pricing_summary,
        "q3_shipping_priority": q_q3_shipping_priority,
        "q5_region_revenue": q_q5_region_revenue,
        "q6_forecast_revenue": q_q6_forecast_revenue,
        "q10_top_customers": q_q10_top_customers,
        "events_json_props": q_events_json_props,
        "kg_edge_rollup": q_kg_edge_rollup,
        "top_order_per_customer": q_top_order_per_customer,
        "events_sessionize": q_events_sessionize,
        "events_hourly": q_events_hourly,
        # training-data operators
        "docs_text_stats": q_docs_text_stats,
        "docs_prefix_dedup": q_docs_prefix_dedup,
        "docs_exact_dup_pairs": q_docs_exact_dup_pairs,
        "docs_ngram_jaccard": q_docs_ngram_jaccard,
        "emb_cosine_topk": q_emb_cosine_topk,
        "emb_near_pairs": q_emb_near_pairs,
        # rows-only (no SQL oracle)
        "docs_minhash_lsh": q_docs_minhash_lsh,
        "docs_simhash_pairs": q_docs_simhash_pairs,
        "emb_lsh_topk": q_emb_lsh_topk,
        "emb_ivf_topk": q_emb_ivf_topk,
        "kg_pipeline_triples": q_kg_pipeline_triples,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------
def oracle_sql() -> dict[str, str]:
    kg = KG.KG_CTE
    return {
        "kg_statistics": f"""{kg}
            SELECT (SELECT COUNT(*) FROM kg_nodes) AS num_nodes,
                   (SELECT COUNT(*) FROM kg_edges) AS num_edges,
                   (SELECT COUNT(DISTINCT type) FROM kg_nodes) AS num_node_types,
                   (SELECT COUNT(DISTINCT type) FROM kg_edges) AS num_edge_types
        """,
        "kg_node_type_counts": f"{kg} SELECT type, COUNT(*) AS n FROM kg_nodes GROUP BY type",
        "kg_edge_type_counts": f"{kg} SELECT type, COUNT(*) AS n FROM kg_edges GROUP BY type",
        "kg_schema_triples": f"""{kg}
            SELECT s.type AS source_type, e.type AS edge_type,
                   t.type AS target_type, COUNT(*) AS triple_count
            FROM kg_edges e
            JOIN kg_nodes s ON e.source_id = s.id
            JOIN kg_nodes t ON e.target_id = t.id
            GROUP BY s.type, e.type, t.type
        """,
        "kg_compact_schema": f"""{kg}
            SELECT s.type AS source_type, t.type AS target_type,
                   COUNT(*) AS edge_count, COUNT(DISTINCT e.type) AS num_edge_types
            FROM kg_edges e
            JOIN kg_nodes s ON e.source_id = s.id
            JOIN kg_nodes t ON e.target_id = t.id
            GROUP BY s.type, t.type
        """,
        "kg_neighborhood": f"""{kg},
            inc AS (SELECT * FROM kg_edges
                    WHERE source_id = 'nation:3' OR target_id = 'nation:3'),
            nb AS (SELECT source_id AS nid FROM inc WHERE source_id <> 'nation:3'
                   UNION
                   SELECT target_id FROM inc WHERE target_id <> 'nation:3'),
            among AS (SELECT e.* FROM kg_edges e
                      WHERE e.source_id IN (SELECT nid FROM nb)
                        AND e.target_id IN (SELECT nid FROM nb))
            SELECT DISTINCT * FROM (
                SELECT * FROM inc UNION ALL SELECT * FROM among)
        """,
        "kg_triple_dedup": f"""{kg}
            SELECT DISTINCT source_id AS subj, type AS pred, target_id AS obj
            FROM kg_edges WHERE type IN ('contains', 'supplied_by')
        """,
        "kg_node_union": f"""{kg},
            ids AS (SELECT source_id AS id FROM kg_edges
                    UNION SELECT target_id FROM kg_edges)
            SELECT id, lower(split_part(id, ':', 1)) AS node_type FROM ids
        """,
        "kg_enrich_broadcast": """
            SELECT r_name AS region_name, c_mktsegment AS mktsegment,
                   COUNT(*) AS n_customers,
                   ROUND(MIN(c_acctbal), 2) AS min_acctbal,
                   ROUND(MAX(c_acctbal), 2) AS max_acctbal
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, c_mktsegment
        """,
        "kg_connected_components": """
            WITH RECURSIVE pairs AS (
                SELECT 'nation:' || n_nationkey AS u,
                       'region:' || n_regionkey AS v FROM nation
                UNION ALL
                SELECT 'supplier:' || s_suppkey, 'nation:' || s_nationkey
                FROM supplier
            ),
            sym AS (SELECT u, v FROM pairs UNION SELECT v AS u, u AS v FROM pairs),
            reach(id, comp) AS (
                SELECT u, u FROM sym
                UNION
                SELECT s.v, r.comp FROM reach r JOIN sym s ON s.u = r.id
            )
            SELECT id, MIN(comp) AS canonical_id FROM reach GROUP BY id
        """,
        "q1_pricing_summary": """
            WITH li AS (
                SELECT l_returnflag, l_linestatus,
                       CAST(l_quantity AS DECIMAL(18,2)) AS qty,
                       CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
                       CAST(l_discount AS DECIMAL(18,2)) AS disc
                FROM lineitem WHERE l_shipdate <= '2000-12-01'
            )
            SELECT l_returnflag, l_linestatus,
                   ROUND(CAST(SUM(qty) AS DOUBLE), 2) AS sum_qty,
                   ROUND(CAST(SUM(price) AS DOUBLE), 2) AS sum_base_price,
                   ROUND(CAST(SUM(price * (CAST(1.0 AS DECIMAL(18,2)) - disc))
                         AS DOUBLE), 4) AS sum_disc_price,
                   ROUND(CAST(SUM(qty) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
                   COUNT(*) AS count_order
            FROM li GROUP BY l_returnflag, l_linestatus
        """,
        "q3_shipping_priority": """
            SELECT l_orderkey, o_orderpriority,
                   ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                         (CAST(1.0 AS DECIMAL(18,2)) -
                          CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 4)
                       AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE l_shipdate > '1996-06-30'
              AND o_orderdate < '1996-06-30'
              AND c_mktsegment = 'BUILDING'
            GROUP BY l_orderkey, o_orderpriority
            ORDER BY revenue DESC, l_orderkey ASC
            LIMIT 10
        """,
        "q5_region_revenue": """
            SELECT r_name AS region_name,
                   ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                         (CAST(1.0 AS DECIMAL(18,2)) -
                          CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 4)
                       AS revenue,
                   COUNT(*) AS n_lineitems
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE c_nationkey = s_nationkey
            GROUP BY r_name
        """,
        "q6_forecast_revenue": """
            SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                       CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE), 4) AS revenue,
                   COUNT(*) AS n_rows
            FROM lineitem
            WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
              AND l_discount >= 0.05 AND l_quantity < 24
        """,
        "q10_top_customers": """
            SELECT c_custkey AS custkey, c_name AS name, n_name AS nation,
                   ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                         (CAST(1.0 AS DECIMAL(18,2)) -
                          CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 4)
                       AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
            GROUP BY c_custkey, c_name, n_name
            ORDER BY revenue DESC, custkey ASC
            LIMIT 20
        """,
        "events_json_props": """
            SELECT json_extract_string(props, '$.k') AS device,
                   event_type, COUNT(*) AS n,
                   ROUND(MIN(value), 6) AS min_value
            FROM events GROUP BY 1, 2
        """,
        "kg_edge_rollup": f"""{kg}
            SELECT split_part(source_id, ':', 1) AS source_kind,
                   split_part(target_id, ':', 1) AS target_kind,
                   COUNT(*) AS n
            FROM kg_edges
            GROUP BY ROLLUP (source_kind, target_kind)
        """,
        "top_order_per_customer": """
            SELECT o_custkey AS custkey, o_orderkey AS orderkey,
                   o_totalprice AS totalprice
            FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
                FROM orders
            ) WHERE rn = 1
        """,
        "events_sessionize": """
            WITH flagged AS (
                SELECT user_id,
                       CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                                PARTITION BY user_id ORDER BY ts, event_id)
                            > 1800 * 1000000 OR LAG(ts) OVER (
                                PARTITION BY user_id ORDER BY ts, event_id)
                            IS NULL
                            THEN 1 ELSE 0 END AS new_session
                FROM events
            )
            SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
                   COUNT(*) AS n_events
            FROM flagged GROUP BY user_id
        """,
        "events_hourly": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
                   event_type, COUNT(*) AS n,
                   ROUND(MIN(value), 6) AS min_value,
                   ROUND(MAX(value), 6) AS max_value
            FROM events GROUP BY 1, 2
        """,
        "docs_text_stats": f"""
            WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
            SELECT doc_id,
                   len(toks) AS n_tokens,
                   ROUND(CAST(len(list_filter(toks, x -> lower(x) IN ({_STOP})))
                         AS DOUBLE) / greatest(len(toks), 1), 6) AS stopword_ratio,
                   list_reduce(
                       list_transform(toks,
                           x -> (length(x) * 131 + ascii(substr(x, 1, 1)))::BIGINT),
                       (a, x) -> (a * 1000003 + x) % 2147483647) AS fingerprint,
                   CASE
                     WHEN greatest(
                        len(list_filter(toks, x -> lower(x) IN ('der','die','das','und'))),
                        len(list_filter(toks, x -> lower(x) IN ('the','and','of','is'))),
                        len(list_filter(toks, x -> lower(x) IN ('el','los','las','que'))),
                        len(list_filter(toks, x -> lower(x) IN ('le','la','les','et')))) = 0
                       THEN 'und'
                     WHEN len(list_filter(toks, x -> lower(x) IN ('der','die','das','und')))
                          >= greatest(
                        len(list_filter(toks, x -> lower(x) IN ('the','and','of','is'))),
                        len(list_filter(toks, x -> lower(x) IN ('el','los','las','que'))),
                        len(list_filter(toks, x -> lower(x) IN ('le','la','les','et'))))
                       THEN 'de'
                     WHEN len(list_filter(toks, x -> lower(x) IN ('the','and','of','is')))
                          >= greatest(
                        len(list_filter(toks, x -> lower(x) IN ('el','los','las','que'))),
                        len(list_filter(toks, x -> lower(x) IN ('le','la','les','et'))))
                       THEN 'en'
                     WHEN len(list_filter(toks, x -> lower(x) IN ('el','los','las','que')))
                          >= len(list_filter(toks, x -> lower(x) IN ('le','la','les','et')))
                       THEN 'es'
                     ELSE 'fr'
                   END AS lang_guess,
                   ROUND(
                     least(length(text) / 500.0, 1.0) * 0.4
                     + least(CAST(len(list_filter(toks, x -> lower(x) IN ({_STOP})))
                             AS DOUBLE) / greatest(len(toks), 1) * 4.0, 1.0) * 0.3
                     + greatest(0.0, 1.0 -
                         CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
                         / greatest(length(text), 1) * 10.0) * 0.3,
                     6) AS quality
            FROM t
        """,
        "docs_prefix_dedup": f"""
            WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            g AS (
                SELECT array_to_string(list_slice(toks, 1, 3), ' ') AS prefix,
                       MIN(doc_id) AS keep_id, COUNT(*) AS n_docs
                FROM t GROUP BY 1
            )
            SELECT prefix, keep_id, n_docs FROM g WHERE n_docs >= 2
        """,
        "docs_exact_dup_pairs": """
            WITH h AS (SELECT doc_id, sha256(text) AS hsh FROM documents),
            k AS (SELECT hsh, MIN(doc_id) AS keep_id FROM h GROUP BY hsh)
            SELECT k.keep_id, h.doc_id AS dup_id
            FROM h JOIN k ON h.hsh = k.hsh WHERE h.doc_id <> k.keep_id
        """,
        "docs_ngram_jaccard": f"""
            WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            s AS (
                SELECT DISTINCT doc_id,
                       array_to_string(list_slice(toks, i, i + 2), ' ') AS shingle
                FROM t, UNNEST(range(1, greatest(len(toks) - 1, 1))) AS u(i)
            ),
            sizes AS (SELECT doc_id, COUNT(*) AS sz FROM s GROUP BY doc_id),
            common AS (
                SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS c
                FROM s a JOIN s b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id
            )
            SELECT common.a, common.b,
                   ROUND(CAST(c AS DOUBLE) / (sa.sz + sb.sz - c), 6) AS jaccard
            FROM common
            JOIN sizes sa ON common.a = sa.doc_id
            JOIN sizes sb ON common.b = sb.doc_id
            WHERE ROUND(CAST(c AS DOUBLE) / (sa.sz + sb.sz - c), 6) >= 0.2
        """,
        "emb_cosine_topk": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
                       WHERE vec_id = 0)
            SELECT vec_id,
                   ROUND(
                     list_dot_product(embedding::DOUBLE[], (SELECT qv FROM q)) /
                     (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) *
                      sqrt(list_dot_product((SELECT qv FROM q), (SELECT qv FROM q)))),
                     6) AS cosine
            FROM embeddings
            ORDER BY cosine DESC, vec_id ASC
            LIMIT 10
        """,
        "emb_near_pairs": """
            SELECT a.vec_id AS a, b.vec_id AS b,
                   ROUND(
                     list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
                     (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
                      sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
                     6) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE ROUND(
                     list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
                     (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
                      sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
                     6) >= 0.3
        """,
    }
