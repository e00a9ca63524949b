"""Plan-quality gates: these tests pin the PHYSICAL plan shape that makes
the engine viable at 100 TB — filter pushdown into the parquet scan, column
pruning, broadcast joins for dimension tables, and no Python row-at-a-time
evaluation in hot paths (whole-stage codegen present).

If a refactor regresses one of these, correctness tests stay green but the
100 TB story dies — hence explicit assertions on explain() output.
"""

from __future__ import annotations

import io as _io
import re
from contextlib import redirect_stdout

from colnade_spark import read_parquet
from colnade_spark.tpch import Customer, Nation, Orders, Region, table_path


def _plan(frame) -> str:
    buf = _io.StringIO()
    with redirect_stdout(buf):
        frame.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    f = read_parquet(table_path(sf_dir, "customer"), Customer, spark=spark).filter(
        Customer.c_acctbal > 1000.0
    )
    plan = _plan(f)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "c_acctbal" in pushed[0], plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    f = (
        read_parquet(table_path(sf_dir, "customer"), Customer, spark=spark)
        .select(Customer.c_custkey, Customer.c_acctbal)
    )
    plan = _plan(f)
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "c_custkey" in rs and "c_name" not in rs and "c_mktsegment" not in rs, rs


def test_dim_join_broadcasts(spark, sf_dir):
    c = read_parquet(table_path(sf_dir, "customer"), Customer, spark=spark)
    n = read_parquet(table_path(sf_dir, "nation"), Nation, spark=spark)
    j = c.join(n, on=Customer.c_nationkey == Nation.n_nationkey)
    plan = _plan(j)
    assert "BroadcastHashJoin" in plan, plan


def test_partial_aggregation_before_shuffle(spark, sf_dir):
    """Group-agg must be HashAggregate(partial) → Exchange →
    HashAggregate(final): the map-side combine is what keeps shuffle volume
    proportional to groups, not rows. (AQE's pre-execution explain doesn't
    render WholeStageCodegen spans, so assert the agg/exchange shape.)"""
    o = read_parquet(table_path(sf_dir, "orders"), Orders, spark=spark)
    out = o.group_by(Orders.o_orderstatus).agg(
        Orders.o_totalprice.sum().alias("s")
    )
    plan = _plan(out)
    assert plan.count("HashAggregate") >= 2, plan
    assert "Exchange" in plan, plan


def test_small_dim_chain_single_shuffle(spark, sf_dir):
    """nation⋈region are both broadcastable: the whole chain should contain
    no shuffle exchange at all (only broadcast exchanges)."""
    n = read_parquet(table_path(sf_dir, "nation"), Nation, spark=spark)
    r = read_parquet(table_path(sf_dir, "region"), Region, spark=spark)
    j = n.join(r, on=Nation.n_regionkey == Region.r_regionkey)
    plan = _plan(j)
    assert "BroadcastHashJoin" in plan
    for line in plan.splitlines():
        if "Exchange" in line and "Broadcast" not in line:
            raise AssertionError(f"unexpected shuffle exchange: {line}\n{plan}")


def _spark_plan(df) -> str:
    buf = _io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _n_shuffles(plan: str) -> int:
    """Count shuffle Exchange operator DETAIL headers ('(n) Exchange') so
    each node counts once (the tree rendering repeats the name)."""
    import re

    return len(re.findall(r"^\(\d+\) Exchange\b", plan, flags=re.MULTILINE))


def test_quality_ops_are_shuffle_free(spark, sf_dir):
    """repetition/gopher/chunk/redact/cluster-assign must be pure narrow
    projections: ZERO exchanges, scan-speed at any scale."""
    from colnade_spark.operators import chunking, embeddings, quality, redact

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = [[0.25] * 64, [-0.25] * 64]
    for df in (
        quality.repetition_stats(docs),
        quality.gopher_flags(docs),
        chunking.chunk_by_tokens(docs, chunk_size=32, overlap=8),
        redact.redact_pii(docs),
        embeddings.cluster_assign(embs, cents),
    ):
        plan = _spark_plan(df)
        assert _n_shuffles(plan) == 0, plan
        # HOF lambda projections are JVM-interpreted (not codegen-fusable),
        # which is fine; what must NEVER appear is row-at-a-time Python
        assert "BatchEvalPython" not in plan, plan


def test_sampling_filters_are_shuffle_free(spark, sf_dir):
    from colnade_spark.operators import sampling

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for df in (
        sampling.hash_sample(docs, 0.25),
        sampling.hash_split(docs, {"a": 0.5, "b": 0.5}),
    ):
        assert _n_shuffles(_spark_plan(df)) == 0


def test_single_shuffle_ops(spark, sf_dir):
    """top-token / stratified / packing / funnel: exactly ONE exchange,
    keyed by their partition column — no hidden second shuffle."""
    from colnade_spark.operators import chunking, funnel, packing, quality, sampling

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    e = read_parquet(
        table_path(sf_dir, "events"),
        __import__("colnade_spark.tpch", fromlist=["Events"]).Events,
        spark=spark,
    ).native
    chunks = chunking.chunk_by_tokens(docs, chunk_size=32, overlap=8)
    cases = [
        (sampling.stratified_sample(docs, "lang", k=5), 1),
        (packing.pack_chunks(chunks, budget=256), 1),
        (funnel.funnel_user_stages(e, ["signup", "view"]), 1),
        # row-local array_sort + max-run fold: no exchange at all
        (quality.top_token_stats(docs), 0),
        (quality.top_ngram_stats(docs, 2), 0),
    ]
    for df, want in cases:
        plan = _spark_plan(df)
        assert _n_shuffles(plan) == want, (want, plan)


def test_tfidf_has_no_term_window(spark, sf_dir):
    """Document frequency must come from groupBy + broadcast join, not a
    term-partitioned window (a hot term would serialize into one
    partition with no partial aggregation)."""
    from colnade_spark.operators import tfidf

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _spark_plan(tfidf.top_terms(docs, k=3))
    assert "windowspecdefinition(term" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_decontaminate_is_broadcast_semi_join(spark, sf_dir):
    """The corpus side must stream through a broadcast LeftSemi —
    never a corpus-keyed SortMergeJoin on gram hashes."""
    from colnade_spark.operators import decontaminate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter("doc_id % 50 = 0")
    plan = _spark_plan(decontaminate.decontaminate(docs, bench, n=13))
    assert "LeftSemi" in plan and "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_melt_is_shuffle_free_expand(spark, sf_dir):
    """Unpivot must plan as a narrow Expand — no exchange, no Python."""
    from colnade_spark.tpch import Lineitem

    li = read_parquet(table_path(sf_dir, "lineitem"), Lineitem, spark=spark)
    plan = _spark_plan(
        li.melt([Lineitem.l_orderkey], [Lineitem.l_discount, Lineitem.l_tax]).native
    )
    assert _n_shuffles(plan) == 0, plan
    assert "Expand" in plan, plan


def test_cube_is_one_expand_one_exchange(spark, sf_dir):
    """cube() must plan as Expand → partial agg → ONE exchange → final agg —
    grouping sets may not multiply exchanges."""
    o = read_parquet(table_path(sf_dir, "orders"), Orders, spark=spark)
    out = o.cube(Orders.o_orderstatus, Orders.o_orderpriority).agg(
        Orders.o_totalprice.sum().alias("s")
    )
    plan = _spark_plan(out.native)
    assert "Expand" in plan, plan
    assert _n_shuffles(plan) == 1, plan


def test_semi_join_projects_right_to_key(spark, sf_dir):
    """Semi/anti joins must not carry right-side payload columns — the
    right side is reduced to its join key before the join."""
    c = read_parquet(table_path(sf_dir, "customer"), Customer, spark=spark)
    o = read_parquet(table_path(sf_dir, "orders"), Orders, spark=spark)
    semi = c.semi_join(o, Customer.c_custkey == Orders.o_custkey)
    plan = _spark_plan(semi.native)
    assert "LeftSemi" in plan, plan
    # right scan is pruned to the key column only
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln and "o_custkey" in ln]
    assert rs and all("o_totalprice" not in ln for ln in rs), plan


def test_interval_join_is_equi_join(spark, sf_dir):
    """Range join must bin-block into an equi-join — never a cartesian or
    broadcast-nested-loop plan."""
    from colnade_spark.operators.intervals import interval_join
    from colnade_spark.tpch import Events
    from pyspark.sql import functions as F

    ev = read_parquet(table_path(sf_dir, "events"), Events, spark=spark).native
    iv = ev.select(
        F.col("event_id").alias("iid"),
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("e"),
    )
    plan = _spark_plan(interval_join(ev.select("ts"), iv, "ts", "s", "e"))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def test_pivot_is_single_exchange_agg(spark, sf_dir):
    """pivot with declared values = ordinary partial→final agg over the
    group keys: ONE exchange, fixed output schema, no extra distinct job."""
    o = read_parquet(table_path(sf_dir, "orders"), Orders, spark=spark)
    piv = o.group_by(Orders.o_orderpriority).pivot(
        Orders.o_orderstatus, ["F", "O", "P"]
    ).agg(Orders.o_orderkey.count().alias("n"))
    plan = _spark_plan(piv.native)
    assert _n_shuffles(plan) == 1, plan
    assert "HashAggregate" in plan, plan


def test_cum_sum_is_one_window_exchange(spark, sf_dir):
    """Running aggregate = one hash-partition exchange on the partition key
    + sort + Window; no join, no second shuffle."""
    from colnade_spark import cum_sum

    o = read_parquet(table_path(sf_dir, "orders"), Orders, spark=spark)
    out = o.with_columns(
        cum_sum(Orders.o_totalprice, partition_by=Orders.o_orderstatus,
                order_by=Orders.o_orderkey).alias("run")
    )
    plan = _spark_plan(out.native)
    assert _n_shuffles(plan) == 1, plan
    assert "Window" in plan, plan


def test_rolling_range_window_is_one_exchange(spark, sf_dir):
    """Event-time rolling window (RANGE frame over epoch-days) = the same
    single hash-partition exchange + sort + Window as the running frame —
    the frame bound changes the Window node, not the exchange count."""
    from colnade_spark import rolling_sum

    o = read_parquet(table_path(sf_dir, "orders"), Orders, spark=spark)
    out = o.with_columns(
        rolling_sum(
            Orders.o_totalprice,
            partition_by=Orders.o_custkey,
            order_by=Orders.o_orderdate.dt_epoch_day(),
            preceding=29,
            range_frame=True,
        ).alias("rev_30d")
    )
    plan = _spark_plan(out.native)
    assert _n_shuffles(plan) == 1, plan
    assert "Window" in plan, plan


def test_edit_distance_candidates_join_on_bucket_keys(spark, sf_dir):
    """The length-band candidate join must be an equi-join keyed on
    (block, bucket) — if the bucket key self-join collapses to a
    trivially-true predicate, candidates degrade to a per-block cross
    join. Pin that the physical join keys include the bucket column."""
    from colnade_spark.operators.dedup import edit_distance_pairs

    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    plan = _spark_plan(edit_distance_pairs(docs, max_dist=8))
    assert "_bkt_a" in plan and "_bkt_b" in plan, plan
    assert "Cross" not in plan, plan


def test_is_in_filter_pushed_to_scan(spark, sf_dir):
    """is_in membership must reach the parquet scan as an In pushed filter
    (row groups whose stats exclude all values are skipped)."""
    o = read_parquet(table_path(sf_dir, "orders"), Orders, spark=spark)
    out = o.filter(Orders.o_orderstatus.is_in(["F", "P"]))
    plan = _spark_plan(out.native)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "In(o_orderstatus" in pushed[0], plan


def test_except_prunes_columns_at_scan(spark, sf_dir):
    """Set ops on a projected frame must not scan unused columns."""
    o = read_parquet(table_path(sf_dir, "orders"), Orders, spark=spark)
    hi = o.filter(Orders.o_totalprice > 100000.0).select(Orders.o_orderkey)
    lo = o.filter(Orders.o_totalprice <= 200000.0).select(Orders.o_orderkey)
    plan = _spark_plan(hi.except_(lo).native)
    for ln in plan.splitlines():
        if "ReadSchema" in ln:
            assert "o_comment" not in ln and "o_orderdate" not in ln, ln


def test_partitioned_write_prunes_partitions_on_read(spark, sf_dir, tmp_path):
    """Hive-partitioned writes must yield partition ELISION on read: a
    filter on the partition column appears as PartitionFilters on the scan
    and non-matching partitions are never listed as input. This is the
    primary 100 TB data-layout lever (scan 1/N of the lake, not N/N)."""
    from colnade_spark.io import write_parquet

    o = read_parquet(table_path(sf_dir, "orders"), Orders, spark=spark)
    dest = str(tmp_path / "orders_by_status")
    write_parquet(o, dest, partition_by=[Orders.o_orderstatus])

    back = read_parquet(dest, Orders, spark=spark).filter(
        Orders.o_orderstatus == "F"
    )
    plan = _plan(back)
    part = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert part and "o_orderstatus" in part[0], plan
    # correctness: counts survive the round trip
    want = o.filter(Orders.o_orderstatus == "F").height
    assert back.height == want


from colnade_spark.dtypes import Float64 as _F64
from colnade_spark.dtypes import Int64 as _I64
from colnade_spark.dtypes import Map as _Map
from colnade_spark.dtypes import Utf8 as _Utf8
from colnade_spark.schema import Column as _Col
from colnade_spark.schema import Schema as _Schema


class _Spend(_Schema):
    c_custkey: _Col[_I64]
    total: _Col[_F64]


class _FlagMap(_Schema):
    l_orderkey: _Col[_I64]
    fm: _Col[_Map[_Utf8, _F64]]


def test_cogroup_map_one_exchange_per_side(spark, sf_dir):
    """cogroup_map must plan as exactly one key-hash exchange per input
    (same shuffle bill as the equivalent join) feeding one
    FlatMapCoGroupsInPandas — no extra repartitions, no broadcast of
    either side."""
    import pandas as pd

    from colnade_spark.tpch import Orders

    def fn(c_pdf, o_pdf):
        if not len(c_pdf):
            return None
        return pd.DataFrame(
            {
                "c_custkey": [int(c_pdf["c_custkey"].iloc[0])],
                "total": [float(o_pdf["o_totalprice"].sum())],
            }
        )

    c = read_parquet(table_path(sf_dir, "customer"), Customer, spark=spark)
    o = read_parquet(table_path(sf_dir, "orders"), Orders, spark=spark)
    out = c.cogroup_map(o, Customer.c_custkey == Orders.o_custkey, fn, _Spend)
    plan = _plan(out)
    assert "FlatMapCoGroupsInPandas" in plan, plan
    assert _n_shuffles(plan) == 2, plan


def test_map_ops_are_codegen_expressions(spark, sf_dir):
    """Typed Map accessors must translate to plain Catalyst expressions
    (no UDF, no extra exchange beyond the aggregations building the map)."""
    from pyspark.sql import functions as F

    from colnade_spark.dataframe import DataFrame as TypedDF
    from colnade_spark.tpch import Lineitem

    li = read_parquet(table_path(sf_dir, "lineitem"), Lineitem, spark=spark)
    per = li.native.groupBy("l_orderkey", "l_returnflag").agg(
        F.sum("l_quantity").alias("q")
    )
    m = per.groupBy("l_orderkey").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("l_returnflag"), F.col("q")))
        ).alias("fm")
    )
    out = TypedDF(m, _FlagMap).with_columns(
        _FlagMap.fm.map.get("N").alias("qn"),
        _FlagMap.fm.map.keys().alias("ks"),
    )
    plan = _plan(out.native)
    assert "InPandas" not in plan and "BatchEvalPython" not in plan, plan
    # two aggregation exchanges only (per-flag sums, per-order map build)
    assert _n_shuffles(plan) == 2, plan


def test_duplicate_spans_shuffles_hashes_not_text(spark, sf_dir):
    """Span dedup: exactly 2 exchanges (gram-hash window count; doc-keyed
    island window), NO join — the corpus-wide occurrence count is a window
    over the single hash exchange, so the scan→gram→hash subtree runs
    once (one Generate) — and no Python evaluation; the exchanged gram
    rows carry (id, pos, 8-byte hash) — raw text must not appear in any
    exchange's output schema."""
    from colnade_spark.operators import spans

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = spans.duplicate_spans(docs, k=8)
    plan = _plan(out)
    assert "BatchEvalPython" not in plan, plan
    assert _n_shuffles(plan) == 2, plan
    assert "Join" not in plan, plan
    assert len(re.findall(r"\(\d+\) Generate", plan)) == 1, plan
    for ln in plan.splitlines():
        if "Exchange" in ln and "Arguments" in ln:
            assert "text" not in ln, ln


def test_remove_duplicate_lines_single_pass(spark, sf_dir):
    """Boilerplate-line removal: ONE split+hash pass (one Generate) with
    the distinct-doc count as stacked windows over the line-hash
    exchange — no anti-join, no broadcast of the unbounded boilerplate
    hash set — and no Python eval. The only join left is the per-doc
    rebuilt text joining back to the input rows."""
    from pyspark.sql import functions as F

    from colnade_spark.operators import spans

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "lined", F.regexp_replace("text", " (?=(\\w+ ){3})", "\n")
    )
    out = spans.remove_duplicate_lines(docs, text_col="lined")
    plan = _plan(out)
    assert "BatchEvalPython" not in plan, plan
    assert "LeftAnti" not in plan, plan
    assert len(re.findall(r"\(\d+\) Generate", plan)) == 1, plan


def test_hashed_classifier_is_scan_speed(spark, sf_dir):
    """Hashed linear scoring: one projection — zero exchanges, zero
    Python; the whole score pipeline stays JVM-side."""
    from colnade_spark.operators import classifier

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = classifier.hashed_linear_score(docs, dim=4096, seed=7)
    plan = _plan(out)
    assert "BatchEvalPython" not in plan, plan
    assert _n_shuffles(plan) == 0, plan


def test_weight_table_classifier_broadcasts_weights(spark, sf_dir):
    """Trained-weight path: the dim-row weight table must broadcast and
    the doc aggregation must partial-aggregate before its exchange."""
    from pyspark.sql import functions as F

    from colnade_spark.operators import classifier

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = spark.range(512).select(
        F.col("id").alias("bucket"),
        classifier.seeded_bucket_weight(F.col("id"), 3).alias("weight"),
    )
    out = classifier.linear_score_with_weights(docs, w, dim=512)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("HashAggregate") >= 2, plan  # partial + final


def test_upsample_epochs_no_shuffle(spark, sf_dir):
    """Epoch upsampling is a scan-speed projection + generate — no
    exchange, no Python."""
    from colnade_spark.operators import sampling

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = sampling.upsample_epochs(
        docs, {"en": 2.5, "de": 1.2}, domain_col="lang"
    )
    plan = _plan(out)
    assert "BatchEvalPython" not in plan, plan
    assert _n_shuffles(plan) == 0, plan
    assert "Generate" in plan, plan


def test_bloom_probe_is_scan_side(spark, sf_dir):
    """Bloom decontamination probing: the bitmap rides as an array
    literal — no join at all; the only exchange is the distinct on the
    surviving ids. No Python eval."""
    from pyspark.sql import functions as F

    from colnade_spark.operators import decontaminate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = decontaminate.bloom_contaminated_ids(
        docs, [0] * 1024, n=13, m_bits=1 << 16, n_hashes=4
    )
    plan = _plan(out)
    assert "BatchEvalPython" not in plan, plan
    assert "Join" not in plan, plan
    assert _n_shuffles(plan) == 1, plan  # ids distinct only


def test_pmi_broadcasts_vocab_and_combines_map_side(spark, sf_dir):
    """PMI: bigram/unigram counts partial-aggregate before their
    exchanges; the vocab-sized count tables join back as broadcasts."""
    from colnade_spark.operators import cooccur

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = cooccur.bigram_pmi(docs, min_count=20)
    plan = _plan(out)
    assert "BatchEvalPython" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan
    # totals ride as a broadcast nested loop (1-row), never a shuffle join
    assert "SortMergeJoin" not in plan, plan


def test_cms_build_single_combined_exchange(spark, sf_dir):
    """CMS build: one map-side-combined exchange carrying at most
    depth×width cells; estimation joins the bounded table as a
    BROADCAST. No Python eval anywhere."""
    from pyspark.sql import functions as F

    from colnade_spark.operators import cms
    from colnade_spark.operators.spans import clean_tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(F.explode(clean_tokens(F.col("text"))).alias("tok"))
    table = cms.cms_build(toks, "tok", depth=4, width=1 << 12)
    plan = _plan(table)
    assert "BatchEvalPython" not in plan, plan
    assert _n_shuffles(plan) == 1, plan
    assert plan.count("HashAggregate") >= 2, plan  # partial + final

    est = cms.cms_estimate(table, toks.limit(10), "tok", depth=4, width=1 << 12)
    eplan = _plan(est)
    assert "BroadcastHashJoin" in eplan, eplan


def test_round4_ops_plan_shapes(spark, sf_dir):
    """Round-4 operators keep their scale contracts: the temperature
    gate and PQ screen are shuffle-free scans; training_order has
    exactly ONE exchange (the shard window); the contamination report
    broadcasts the benchmark gram set; group_split never nested-loops."""
    from pyspark.sql import functions as F

    from colnade_spark.operators import sampling
    from colnade_spark.operators.decontaminate import contamination_report
    from colnade_spark.operators.pq import pq_screen_gate
    from colnade_spark.operators.shards import training_order

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # temperature gate: after the (driver-side) count, pure scan filter
    tm = sampling.temperature_mixture(docs, alpha=0.5)
    assert _n_shuffles(_spark_plan(tm)) == 0

    # PQ screen: encode + literal-LUT max + filter, zero exchanges
    bench = [r.embedding for r in embs.limit(2).collect()]
    books = [[[0.0] * 8 for _ in range(8)] for _ in range(8)]
    scr = pq_screen_gate(
        embs.select("vec_id", "embedding"), bench, books, threshold=0.9
    )
    assert _n_shuffles(_spark_plan(scr)) == 0

    # training order: ONE exchange (the per-shard rank window)
    to = training_order(docs.select("doc_id"), n_shards=8)
    assert _n_shuffles(_spark_plan(to)) == 1

    # contamination report: bench grams ride broadcast joins; the corpus
    # side is never nested-looped
    rep = contamination_report(
        docs.filter(F.col("doc_id") % 50 != 0),
        docs.filter(F.col("doc_id") % 50 == 0),
        n=8,
    )
    plan = _spark_plan(rep)
    assert "BroadcastHashJoin" in plan and "NestedLoop" not in plan, plan

    # group_split: equi-join only (hash/merge), no nested loop
    groups = docs.select("doc_id", (F.col("doc_id") % 7).alias("component"))
    gs = sampling.group_split(docs, groups, {"a": 0.5, "b": 0.5})
    plan = _spark_plan(gs)
    assert "NestedLoop" not in plan, plan


def test_round5_ops_plan_shapes(spark, sf_dir):
    """Round-5 operators keep their scale contracts: balanced
    training_order never builds a global single-partition window (one
    per-bucket cumsum + one per-shard rank exchange, bucket count
    bounded); corpus_diff joins fingerprints only (text never crosses
    the join); the PQ contamination report has exactly ONE aggregation
    shuffle; corpus_card / perplexity_buckets windows are key-
    partitioned, not global."""
    from pyspark.sql import functions as F

    from colnade_spark.operators import report
    from colnade_spark.operators.quality import perplexity_buckets
    from colnade_spark.operators.shards import training_order

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # balanced shards: no SinglePartition exchange anywhere
    bal = training_order(
        docs.select("doc_id", "n_chars"), n_shards=8, balance_col="n_chars"
    )
    plan = _spark_plan(bal)
    assert "SinglePartition" not in plan, plan

    # corpus_diff: the join's input projections carry id+fingerprint
    # only — the raw text column must not appear above the scans
    diff = report.corpus_diff(docs, new=docs.withColumn("doc_id", F.col("doc_id") + 1))
    fplan = _spark_plan(diff)
    assert "FullOuter" in fplan, fplan
    # what crosses the shuffles is (id, fingerprint) only — no raw text:
    # every Exchange node's Input line must be text-free
    lines = fplan.splitlines()
    ex_inputs = [
        lines[i + 1]
        for i, ln in enumerate(lines)
        if ln.startswith("(") and ") Exchange" in ln and i + 1 < len(lines)
    ]
    assert ex_inputs and all("text#" not in ln for ln in ex_inputs), fplan

    # pq contamination report: exactly one exchange (the |queries|-group agg)
    from colnade_spark.operators.pq import pq_contamination_report, pq_encode

    books = [[[0.0] * 8 for _ in range(8)] for _ in range(8)]
    bench = [r.embedding for r in embs.limit(2).collect()]
    codes = pq_encode(embs.select("vec_id", "embedding"), books)
    rep = pq_contamination_report(codes, bench, books, threshold=0.9)
    assert _n_shuffles(_spark_plan(rep)) == 1

    # corpus_card + perplexity buckets: every window is key-partitioned
    card = report.corpus_card(docs, group_col="lang", size_col="n_chars")
    assert "SinglePartition" not in _spark_plan(card)
    # the approx card is the no-sort tier: percentile_approx folds into
    # the hash aggregate — NO window and NO sort may appear, or the
    # operator has lost its reason to exist (sort-free huge groups)
    acard = report.corpus_card_approx(docs, group_col="lang", size_col="n_chars")
    aplan = _spark_plan(acard)
    assert "Window" not in aplan and "Sort" not in aplan, aplan
    pb = perplexity_buckets(
        docs.select("doc_id", "lang", F.col("n_chars").cast("double").alias("s")),
        "s",
        domain_col="lang",
    )
    assert "SinglePartition" not in _spark_plan(pb)


def test_round6_ops_plan_shapes(spark, sf_dir):
    """Round-6 operators keep their scale contracts: the minhash
    estimator audit's candidate generation shuffles sketches only (raw
    text never crosses an Exchange — the shingle arrays join back after
    pair dedup); the incremental drop policy stays banded (no cartesian
    anywhere); the per-lang dedup datasheet aggregates without a global
    single-partition stage."""
    from pyspark.sql import functions as F

    from colnade_spark.operators import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    audit = dedup.minhash_estimate_audit(docs, num_hashes=32, bands=8)
    aplan = _spark_plan(audit)
    lines = aplan.splitlines()
    ex_inputs = [
        lines[i + 1]
        for i, ln in enumerate(lines)
        if ln.startswith("(") and ") Exchange" in ln and i + 1 < len(lines)
    ]
    assert ex_inputs and all("text#" not in ln for ln in ex_inputs), aplan
    assert "Cartesian" not in aplan, aplan

    sigs = dedup.minhash_signatures(docs, num_hashes=32)
    drop = dedup._minhash_drop_ids(
        sigs, sigs.select("doc_id", "_sig"), "doc_id", 0.8, 32, 8
    )
    dplan = _spark_plan(drop)
    assert "Cartesian" not in dplan, dplan

    import __spark_entry__ as entry

    rates = entry.dedup_rates_by_lang(spark, sf_dir)
    rplan = _spark_plan(rates)
    assert "Cartesian" not in rplan, rplan


def test_round6_weighting_and_diagnostics_plan_shapes(spark, sf_dir):
    """The round-6 weighting/diagnostics operators keep their scale
    contracts: prototypicality scores scan-side (no exchange/join — the
    centroids are literals); prototype_prune adds exactly one
    cluster-keyed exchange for the rank window; commonness_weights
    shuffles (id, gram-hash) pairs only (raw text never crosses an
    Exchange); fertility_stats is one map-side-combined aggregation;
    source_overlap_matrix carries (digest, source) only through its
    exchanges and broadcasts the totals; length_drift_psi windows over
    the bounded count table, never the corpus."""
    from pyspark.sql import functions as F

    from colnade_spark.operators.clustering import (
        kmeans,
        prototype_prune,
        prototypicality,
    )
    from colnade_spark.operators.importance import commonness_weights
    from colnade_spark.operators.report import (
        length_drift_psi,
        source_overlap_matrix,
    )
    from colnade_spark.operators.text import fertility_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    _, cents = kmeans(embs, k=4, iters=0, return_centroids=True)
    splan = _spark_plan(prototypicality(embs, cents))
    assert "Exchange" not in splan and "Join" not in splan, splan
    pplan = _spark_plan(prototype_prune(embs, cents, 0.5))
    assert pplan.count(") Exchange") == 1 and "Join" not in pplan, pplan

    def _exchange_inputs(plan):
        lines = plan.splitlines()
        return [
            lines[i + 1]
            for i, ln in enumerate(lines)
            if ln.startswith("(") and ") Exchange" in ln and i + 1 < len(lines)
        ]

    cwplan = _spark_plan(commonness_weights(docs, n=3))
    cw_ex = _exchange_inputs(cwplan)
    assert cw_ex and all("text#" not in ln for ln in cw_ex), cwplan

    fplan = _spark_plan(fertility_stats(docs))
    assert fplan.count(") Exchange") == 1, fplan
    assert "Join" not in fplan and "Window" not in fplan, fplan

    mplan = _spark_plan(source_overlap_matrix(docs))
    m_ex = _exchange_inputs(mplan)
    assert m_ex and all("text#" not in ln for ln in m_ex), mplan
    assert "BroadcastHashJoin" in mplan and "Cartesian" not in mplan, mplan

    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    psi = length_drift_psi(old, new=new, group_col="lang")
    psiplan = _spark_plan(psi)
    # the window runs over the post-aggregation count table: every
    # Window sits above a HashAggregate, never directly on the scan
    assert "Window" in psiplan and "Cartesian" not in psiplan, psiplan
    p_ex = _exchange_inputs(psiplan)
    assert p_ex and all("text#" not in ln for ln in p_ex), psiplan
