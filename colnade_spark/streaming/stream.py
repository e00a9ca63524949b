"""StreamFrame: schema-typed wrapper over a streaming pyspark DataFrame.

Design notes (scale-first):
- File sources only list + incrementally process new files; the declared
  schema is mandatory (streaming reads cannot infer).
- ``with_watermark`` is required before any window aggregation: it bounds
  state-store size (late rows beyond the delay are dropped) — without it a
  100 TB/day stream accumulates state forever.
- ``window_agg`` emits tumbling/sliding event-time windows via the built-in
  ``window()`` function — incremental, partial-aggregated, AQE-free but
  state-store backed.
- Sinks: ``to_memory_sink`` for tests (availableNow trigger processes the
  backlog then stops), ``to_parquet_sink`` for real output with
  checkpointing.
"""

from __future__ import annotations

from typing import Any, Generic, TypeVar

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from colnade_spark.backend import SparkBackend
from colnade_spark.conversion import to_struct_type
from colnade_spark.dataframe import _names
from colnade_spark.expr import AliasedExpr, Expr
from colnade_spark.schema import Column, Schema

S = TypeVar("S", bound=Schema)

_backend = SparkBackend()


def maintain_partitioned_table(
    stream: SparkDF,
    build_fn,
    table_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """The foreachBatch overwrite-batch_id-partition maintenance pattern
    shared by every mergeable-model maintainer (HLL sketch tables, Bloom
    word tables, CMS cell tables): per micro-batch, ``build_fn(batch_df)``
    produces that batch's model rows, which OVERWRITE the batch's own
    ``batch_id=<n>`` partition — idempotent under redelivery (a replayed
    batch replaces itself), and the model's associative merge makes the
    partition history equal a single batch build over everything ever
    streamed. Returns the started StreamingQuery."""

    def _write(batch_df: SparkDF, batch_id: int) -> None:
        build_fn(batch_df).write.mode("overwrite").parquet(
            f"{table_path}/batch_id={batch_id}"
        )

    w = stream.writeStream.foreachBatch(_write).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def compact_batched_table(
    spark,
    table_path: str,
    dest_path: str,
    expect_kind: str,
    resolve=None,
) -> dict:
    """Collapse a per-micro-batch partitioned maintainer table (one
    ``batch_id=<n>`` partition per batch, params manifest beside it) into
    ONE epoch partition plus the verbatim trailing partition, written to
    a FRESH ``dest_path`` — the shared skeleton behind
    ``report.compact_corpus_fingerprints`` and
    ``dedup.compact_minhash_sigs``. The swap is the caller's move (rename
    while the maintainer is quiesced); compaction never overwrites its
    own input, and a pre-existing ``dest_path`` is refused (a leftover
    epoch partition from an abandoned run would ride into the swap).

    The trailing partition is NEVER folded: maintainers write their batch
    partitions BEFORE the streaming checkpoint commits, so after a crash
    the on-disk max batch id may belong to an UNCOMMITTED batch that the
    restarted stream will redeliver — folding it would label the epoch
    with that id, and the redelivered batch (gating on strictly-earlier
    ids) would see NO state while its own overwrite erased the compacted
    history. Batches below the max are always committed (streaming is
    sequential), so epoch = second-max id is safe with no unverifiable
    "checkpoint has committed" precondition.

    ``resolve(body_df, manifest) -> DataFrame``: optional per-table
    reduction of the folded history (e.g. latest-fingerprint-per-id);
    ``None`` carries the folded rows verbatim (minus ``batch_id``) for
    append-only stores. Returns ``{"rows", "epoch", "carried_batch",
    "source_batches"}``."""
    from pyspark.sql import functions as F

    mf = read_table_manifest(spark, table_path)
    if mf is None or mf.get("kind") != expect_kind:
        raise ValueError(
            f"no {expect_kind} manifest at {table_path}; was this table"
            " written by its maintainer?"
        )
    fs, dp, _ = _hadoop_path(spark, dest_path)
    if fs.exists(dp):
        raise ValueError(
            f"dest_path {dest_path} already exists; compaction writes a"
            " FRESH table (a leftover epoch partition from an abandoned"
            " run would ride into the swap) — pick a new directory"
        )
    hist = spark.read.parquet(table_path)
    batches = sorted(
        r[0] for r in hist.select("batch_id").distinct().collect()
    )
    if len(batches) < 2:
        raise ValueError(
            f"table at {table_path} has {len(batches)} batch"
            " partition(s); the trailing partition is never folded (it"
            " may belong to an uncommitted batch), so there is nothing"
            " to compact"
        )
    carried = batches[-1]
    epoch = batches[-2]
    body = hist.filter(F.col("batch_id") <= F.lit(epoch))
    body = resolve(body, mf) if resolve else body.drop("batch_id")
    body.write.parquet(f"{dest_path}/batch_id={epoch}")
    hist.filter(F.col("batch_id") == F.lit(carried)).drop(
        "batch_id"
    ).write.parquet(f"{dest_path}/batch_id={carried}")
    write_table_manifest(spark, dest_path, mf)
    n = spark.read.parquet(f"{dest_path}/batch_id={epoch}").count()
    return {
        "rows": n,
        "epoch": epoch,
        "carried_batch": carried,
        "source_batches": len(batches) - 1,
    }


_MANIFEST_NAME = "_table_params.json"


def read_batched_history(spark, table_path: str):
    """History reader shared by the ``batch_id``-partitioned maintainer
    stores (minhash signatures, churn fingerprints): the store's rows,
    or None ONLY when the store genuinely has no batch partitions yet
    (first batch — the params manifest legitimately sits there alone).
    The first-batch probe is an explicit directory listing, NOT an
    exception catch: a store made unreadable mid-run (corrupt footer,
    partially deleted path) must FAIL the batch, because silently
    gating against an empty history admits near-duplicates / mislabels
    churn — strictly worse than a crash."""
    fs, p, _ = _hadoop_path(spark, table_path)
    if not fs.exists(p):
        return None
    has_parts = any(
        st.getPath().getName().startswith("batch_id=")
        for st in fs.listStatus(p)
    )
    if not has_parts:
        return None
    return spark.read.parquet(table_path)


def _hadoop_path(spark, path_str: str):
    """(fs, path, jvm) via the Hadoop FileSystem API — works on any
    filesystem the cluster can reach (local, HDFS, object stores),
    unlike driver-local ``open()``."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path_str)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p, jvm


def read_table_manifest(
    spark, table_path: str, name: str = _MANIFEST_NAME
) -> dict | None:
    """The params manifest persisted next to a maintained model table
    (Bloom/CMS/HLL layouts are functions of their build parameters —
    probing old rows with new parameters silently mis-answers), or None
    for a pre-manifest table."""
    import json

    fs, p, jvm = _hadoop_path(spark, f"{table_path}/{name}")
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        baos = jvm.java.io.ByteArrayOutputStream()
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, 4096, False)
        return json.loads(bytes(baos.toByteArray()).decode("utf-8"))
    finally:
        stream.close()


def write_table_manifest(
    spark, table_path: str, params: dict, name: str = _MANIFEST_NAME
) -> dict:
    """Write a params manifest for a maintained table, or verify it
    against an existing one — ERRORING on mismatch rather than letting a
    maintainer append rows in an incompatible layout."""
    import json

    existing = read_table_manifest(spark, table_path, name)
    if existing is not None:
        if existing != params:
            raise ValueError(
                f"table at {table_path} was built with {existing}; "
                f"refusing to continue it with {params}"
            )
        return params
    fs, p, _ = _hadoop_path(spark, f"{table_path}/{name}")
    out = fs.create(p, True)
    try:
        out.write(bytearray(json.dumps(params, sort_keys=True).encode("utf-8")))
    finally:
        out.close()
    return params


def verify_table_manifest(
    spark, table_path: str, expect: dict, name: str = _MANIFEST_NAME
) -> None:
    """Error when a persisted manifest disagrees with the caller's
    expected parameters (pre-manifest tables skip the check)."""
    mf = read_table_manifest(spark, table_path, name)
    if mf is None:
        return
    diff = {k: v for k, v in expect.items() if mf.get(k) != v}
    if diff:
        raise ValueError(
            f"table at {table_path} was built with "
            f"{ {k: mf.get(k) for k in diff} }; caller expected {diff} "
            "— probing with mismatched parameters yields wrong answers"
        )


def scan_stream_parquet(
    path: str, schema: type[S], *, spark: SparkSession
) -> StreamFrame[S]:
    """Incremental parquet file source with the declared schema.

    Nanos handling mirrors batch io exactly: the parquet LOGICAL-type
    metadata decides which columns are TIMESTAMP(NANOS); only those set the
    legacy ``nanosAsLong`` conf, are declared Long at the source, and are
    integer-divided back to microsecond timestamps. A plain-INT64 column (or
    a non-nanos file) never triggers the conf or the division — it streams
    through unchanged."""
    from colnade_spark.io import _nanos_columns, _normalize_scan, _reader as _io_reader

    nanos = _nanos_columns(path)
    # same metadata-gated nanosAsLong policy as batch io (set BEFORE the
    # probe/scan so nanos columns arrive as long instead of erroring)
    spark = _io_reader(spark, nanos)
    struct = to_struct_type(schema)
    # nanos timestamps arrive as long under nanosAsLong; declare long at the
    # source and let _normalize_scan convert (same policy as batch io)
    import pyspark.sql.types as T

    try:
        probe = spark.read.parquet(path).schema
    except (AnalysisException, FileNotFoundError):
        # empty / not-yet-populated source directory — THE streaming setup
        # (the schema is declared precisely because no data exists yet);
        # use the declared struct unchanged, the nanos fixup is moot.
        # ONLY the missing/empty-source analysis errors are swallowed:
        # corrupt footers, permission faults, and transient FS errors
        # propagate now instead of surfacing later (or silently skipping
        # the nanos fixup) once the stream starts.
        probe = T.StructType([])
    fields = []
    for f in struct.fields:
        actual = next((a for a in probe.fields if a.name == f.name), None)
        if (
            isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType))
            and actual is not None
            and isinstance(actual.dataType, T.LongType)
        ):
            # declare Long whenever the PHYSICAL type is Long (a stream
            # schema must match the file); whether it is then divided back
            # to a timestamp is decided by the metadata gate below — a
            # plain-INT64 column stays Long, exactly like batch io
            fields.append(T.StructField(f.name, T.LongType(), f.nullable))
        else:
            fields.append(f)
    import os

    reader = spark.readStream.schema(T.StructType(fields))
    if os.path.isfile(path):
        # file-source streams monitor directories; for a single-file path
        # watch the parent directory with a glob filter selecting the file
        # (glob metacharacters in the basename escaped to match literally)
        base = "".join(
            "[" + c + "]" if c in "\\*?[]{}" else c
            for c in os.path.basename(path)
        )
        reader = reader.option("pathGlobFilter", base)
        path = os.path.dirname(os.path.abspath(path))
    data = reader.parquet(path)
    return StreamFrame(_normalize_scan(data, schema, nanos), schema)


def scan_stream_json(
    path: str, schema: type[S], *, spark: SparkSession
) -> StreamFrame[S]:
    """JSON-lines streaming source with the declared schema — the
    log-pipeline ingest shape. No inference pass; under PERMISSIVE a
    malformed line null-fills its row, so pair with a periodic batch
    ``read_json_quarantine`` over the same landing directory when the
    feed needs repair auditing."""
    data = spark.readStream.schema(to_struct_type(schema)).json(path)
    return StreamFrame(data, schema)


def scan_stream_csv(
    path: str, schema: type[S], *, spark: SparkSession, header: bool = True
) -> StreamFrame[S]:
    # CSV has no parquet nanos quirk — no legacy conf involved.
    data = (
        spark.readStream
        .schema(to_struct_type(schema))
        .csv(path, header=header)
    )
    return StreamFrame(data, schema)


class StreamFrame(Generic[S]):
    """Typed streaming frame: row-level ops via the shared AST translation,
    plus watermark / window aggregation / sinks."""

    def __init__(self, data: SparkDF, schema: type[S] | None):
        self._data = data
        self._schema = schema
        self._watermark_col: str | None = None

    # -- introspection ----------------------------------------------------
    @property
    def native(self) -> SparkDF:
        return self._data

    @property
    def schema(self) -> type[S] | None:
        return self._schema

    @property
    def is_streaming(self) -> bool:
        return bool(self._data.isStreaming)

    def _wrap(self, data: SparkDF) -> StreamFrame[S]:
        out = StreamFrame(data, self._schema)
        out._watermark_col = self._watermark_col
        return out

    # -- row-level ops (shared translation) -------------------------------
    def filter(self, predicate: Expr) -> StreamFrame[S]:
        return self._wrap(self._data.filter(_backend.translate_expr(predicate)))

    def select(self, *cols: Column | str) -> StreamFrame[Any]:
        out = StreamFrame(self._data.select(*_names(cols)), None)
        out._watermark_col = self._watermark_col
        return out

    def with_columns(self, *exprs: AliasedExpr) -> StreamFrame[S]:
        return self._wrap(
            self._data.withColumns(
                {e.out_name: _backend.translate_expr(e.expr) for e in exprs}
            )
        )

    def with_raw(self, fn) -> StreamFrame[S]:
        return self._wrap(fn(self._data))

    # -- streaming-specific ------------------------------------------------
    def with_watermark(self, ts_col: Column | str, delay: str) -> StreamFrame[S]:
        """Event-time watermark: bounds aggregation state (rows later than
        ``delay`` behind the max seen event time are dropped)."""
        name = ts_col if isinstance(ts_col, str) else ts_col.name
        out = self._wrap(self._data.withWatermark(name, delay))
        out._watermark_col = name
        return out

    def window_agg(
        self,
        ts_col: Column | str,
        duration: str,
        *aggs: AliasedExpr,
        slide: str | None = None,
        keys: tuple[Column | str, ...] = (),
    ) -> StreamFrame[Any]:
        """Tumbling (or sliding) event-time window aggregation.

        Requires a prior ``with_watermark`` — enforced here, because append
        sinks can never emit and state never evicts otherwise.
        """
        if self._watermark_col is None:
            raise ValueError(
                "window_agg requires with_watermark() first: unbounded "
                "streaming state does not survive at scale"
            )
        name = ts_col if isinstance(ts_col, str) else ts_col.name
        win = F.window(F.col(name), duration, slide or duration)
        group_cols = [win] + [F.col(k if isinstance(k, str) else k.name) for k in keys]
        translated = [
            _backend.translate_expr(a.expr).alias(a.out_name) for a in aggs
        ]
        out = self._data.groupBy(*group_cols).agg(*translated)
        flat = out.select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *[c for c in out.columns if c != "window"],
        )
        wrapped = StreamFrame(flat, None)
        wrapped._watermark_col = self._watermark_col
        return wrapped

    def session_window_agg(
        self,
        ts_col: Column | str,
        gap: str,
        *aggs: AliasedExpr,
        keys: tuple[Column | str, ...] = (),
    ) -> StreamFrame[Any]:
        """Gap-based session windows via Spark's NATIVE session_window —
        the declarative twin of operators.sessions.sessionize_stream
        (applyInPandasWithState). Prefer this one: state management,
        session merging across micro-batches, and watermark eviction are
        engine-owned. The custom-state variant remains as the pattern for
        session semantics session_window can't express (e.g. per-session
        caps or payload-dependent gaps).

        Requires ``with_watermark`` first (state eviction), like
        window_agg. Output carries session_start/session_end.
        """
        if self._watermark_col is None:
            raise ValueError(
                "session_window_agg requires with_watermark() first: "
                "session state does not evict otherwise"
            )
        name = ts_col if isinstance(ts_col, str) else ts_col.name
        win = F.session_window(F.col(name), gap)
        group_cols = [win] + [F.col(k if isinstance(k, str) else k.name) for k in keys]
        translated = [
            _backend.translate_expr(a.expr).alias(a.out_name) for a in aggs
        ]
        out = self._data.groupBy(*group_cols).agg(*translated)
        flat = out.select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            *[c for c in out.columns if c != "session_window"],
        )
        wrapped = StreamFrame(flat, None)
        wrapped._watermark_col = self._watermark_col
        return wrapped

    def drop_duplicates(self, *cols: Column | str) -> StreamFrame[S]:
        """Streaming exact dedup on the given key columns (all columns if
        none given). State grows with the number of DISTINCT keys ever
        seen and never evicts — only safe for bounded key domains; for
        content dedup at scale use
        :meth:`drop_duplicates_within_watermark`."""
        names = _names(cols) if cols else None
        return self._wrap(
            self._data.dropDuplicates(names) if names else self._data.dropDuplicates()
        )

    def drop_duplicates_within_watermark(
        self, *cols: Column | str
    ) -> StreamFrame[S]:
        """Streaming dedup whose state EVICTS with the event-time
        watermark: a duplicate arriving within the watermark delay of its
        first occurrence is dropped; state for keys older than the
        watermark is freed. This is the 100 TB streaming-ingest dedup —
        state is O(keys per watermark window), not O(all keys ever).
        Requires ``with_watermark`` first (enforced)."""
        if self._watermark_col is None:
            raise ValueError(
                "drop_duplicates_within_watermark requires with_watermark() "
                "first: without one the state store can never evict"
            )
        names = _names(cols) if cols else None
        data = (
            self._data.dropDuplicatesWithinWatermark(names)
            if names
            else self._data.dropDuplicatesWithinWatermark()
        )
        return self._wrap(data)

    def group_agg(
        self,
        keys: tuple[Column | str, ...],
        *aggs: AliasedExpr,
    ) -> StreamFrame[Any]:
        """Keyed streaming aggregation WITHOUT an event-time window —
        running totals per key, emitted in update/complete mode. State is
        one row per distinct key (bounded by the key domain, not the
        stream length); use ``window_agg`` when keys are unbounded."""
        group_cols = [F.col(k if isinstance(k, str) else k.name) for k in keys]
        translated = [
            _backend.translate_expr(a.expr).alias(a.out_name) for a in aggs
        ]
        out = StreamFrame(self._data.groupBy(*group_cols).agg(*translated), None)
        out._watermark_col = self._watermark_col
        return out

    def join_stream(
        self,
        other: StreamFrame[Any],
        on,
        *,
        time_condition: str | None = None,
        how: str = "inner",
    ) -> StreamFrame[Any]:
        """Stream-stream join. BOTH sides must carry an event-time
        watermark (enforced): without them the join state grows without
        bound. ``on`` is a typed cross-schema equality (JoinCondition);
        ``time_condition`` is an optional raw SQL event-time range (e.g.
        ``"r_ts BETWEEN l_ts AND l_ts + INTERVAL 1 HOUR"``) — with one,
        Spark evicts state as the watermark passes the range; without
        one, state is bounded only by the watermark delay on the keys.
        Column names must be disjoint (pre-select/rename both sides);
        outer variants additionally require the time bound per Spark's
        stream-join semantics."""
        if self._watermark_col is None or other._watermark_col is None:
            raise ValueError(
                "join_stream requires with_watermark() on BOTH sides: "
                "stream-stream join state cannot evict otherwise"
            )
        left, right = self._data, other._data
        # same collision policy as the batch backend: right side renames
        # colliding columns to <name>__r before the join
        rename = {n: f"{n}__r" for n in set(left.columns) & set(right.columns)}
        right = right.withColumnsRenamed(rename) if rename else right
        lname = on.left.name
        rname = rename.get(on.right.name, on.right.name)
        cond = left[lname] == right[rname]
        if time_condition is not None:
            cond = cond & F.expr(time_condition)
        out = StreamFrame(left.join(right, cond, how), None)
        out._watermark_col = self._watermark_col
        return out

    # -- sinks -------------------------------------------------------------
    def to_memory_sink(
        self, name: str, *, output_mode: str = "append", available_now: bool = True
    ):
        """Test sink: process the current backlog (availableNow) into an
        in-memory table, return the StreamingQuery."""
        return (
            self._data.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=available_now)
            .start()
        )

    def to_foreach_batch_sink(
        self,
        fn,
        checkpoint: str,
        *,
        available_now: bool = True,
    ):
        """Arbitrary per-micro-batch sink: ``fn(batch_df, batch_id)``.
        The checkpoint tracks committed batch ids, so after a crash the
        same batch can be REDELIVERED — ``fn`` must be idempotent in
        ``batch_id`` (see ``to_idempotent_parquet_sink`` for the canned
        pattern)."""
        w = (
            self._data.writeStream.foreachBatch(fn)
            .option("checkpointLocation", checkpoint)
        )
        if available_now:
            w = w.trigger(availableNow=True)
        return w.start()

    def to_idempotent_parquet_sink(
        self,
        path: str,
        checkpoint: str,
        *,
        available_now: bool = True,
    ):
        """Exactly-once-style parquet sink: each micro-batch OVERWRITES
        its own ``batch_id=<n>`` partition directory, so a redelivered
        batch replaces itself instead of appending duplicates — the
        standard foreachBatch transactional-by-batch-id pattern for
        stores without atomic commit. Read the result with
        ``spark.read.parquet(path)`` (batch_id appears as a partition
        column)."""

        def _write(batch_df: SparkDF, batch_id: int) -> None:
            batch_df.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

        return self.to_foreach_batch_sink(
            _write, checkpoint, available_now=available_now
        )

    def to_parquet_sink(
        self,
        path: str,
        checkpoint: str,
        *,
        output_mode: str = "append",
        available_now: bool = False,
        partition_by: list[str] | None = None,
    ):
        w = (
            self._data.writeStream.format("parquet")
            .option("path", path)
            .option("checkpointLocation", checkpoint)
            .outputMode(output_mode)
        )
        if partition_by:
            w = w.partitionBy(*partition_by)
        if available_now:
            w = w.trigger(availableNow=True)
        return w.start()
