"""Deterministic training order: (shard, pos) is a stable total order —
a permutation of the corpus, uniform across shards, identical across
runs/partitionings — and write_training_shards materializes each shard
pos-ordered in its own directory."""

from __future__ import annotations

from pyspark.sql import functions as F

from colnade_spark.operators.shards import training_order, write_training_shards


def test_training_order_is_a_stable_permutation(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], ["doc_id"])
    out = training_order(df, n_shards=8, salt="s")
    rows = out.collect()
    assert len(rows) == 1000
    # a permutation: (shard, pos) pairs are unique, pos is 1..n_shard
    coords = {(r.shard, r.pos) for r in rows}
    assert len(coords) == 1000
    per_shard = {}
    for r in rows:
        per_shard.setdefault(r.shard, []).append(r.pos)
    assert set(per_shard) == set(range(8))
    for poss in per_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # roughly uniform (1000 rows over 8 shards)
    sizes = [len(v) for v in per_shard.values()]
    assert min(sizes) > 80 and max(sizes) < 170
    # stable across a different input partitioning
    again = training_order(df.repartition(13), n_shards=8, salt="s")
    assert {(r.doc_id, r.shard, r.pos) for r in again.collect()} == {
        (r.doc_id, r.shard, r.pos) for r in rows
    }
    # the order is not the input order (it IS a shuffle)
    first_shard = sorted(
        (r.pos, r.doc_id) for r in rows if r.shard == 0
    )
    assert [d for _, d in first_shard] != sorted(d for _, d in first_shard)


def test_write_training_shards_layout(spark, tmp_path):
    df = spark.createDataFrame([(i, f"t{i}") for i in range(200)], ["doc_id", "text"])
    dest = str(tmp_path / "shards")
    write_training_shards(df, dest, n_shards=4, salt="w")
    import os

    dirs = sorted(d for d in os.listdir(dest) if d.startswith("shard="))
    assert dirs == [f"shard={i}" for i in range(4)]
    back = spark.read.parquet(dest)
    assert back.count() == 200
    # each shard directory holds ONE file, stored in pos order
    for i in range(4):
        files = [
            f for f in os.listdir(f"{dest}/shard={i}") if f.endswith(".parquet")
        ]
        assert len(files) == 1
        got = [
            r.pos
            for r in spark.read.parquet(f"{dest}/shard={i}/{files[0]}").collect()
        ]
        assert got == sorted(got)
    # content equals the logical training_order
    want = {
        (r.doc_id, r.shard, r.pos)
        for r in training_order(df, 4, salt="w").collect()
    }
    assert {(r.doc_id, r.shard, r.pos) for r in back.collect()} == want


def test_training_order_curriculum_mode(spark):
    """With score_col, every shard serves ascending scores (easiest
    first) while shard membership stays the pure hash (identical to
    hash mode) — difficulty progresses in parallel across readers."""
    df = spark.createDataFrame(
        [(i, float((i * 31) % 97)) for i in range(400)],
        ["doc_id", "difficulty"],
    )
    plain = training_order(df, n_shards=4, salt="c")
    cur = training_order(df, n_shards=4, salt="c", score_col="difficulty")
    # same membership
    assert {(r.doc_id, r.shard) for r in cur.collect()} == {
        (r.doc_id, r.shard) for r in plain.collect()
    }
    # ascending difficulty within each shard
    rows = cur.collect()
    per = {}
    for r in rows:
        per.setdefault(r.shard, []).append((r.pos, r.difficulty))
    for shard, lst in per.items():
        seq = [d for _, d in sorted(lst)]
        assert seq == sorted(seq), shard
    # deterministic
    again = training_order(df.repartition(7), 4, salt="c", score_col="difficulty")
    assert {(r.doc_id, r.shard, r.pos) for r in again.collect()} == {
        (r.doc_id, r.shard, r.pos) for r in rows
    }


def test_training_order_balanced_mode(spark):
    """With balance_col on a heavy-tailed weight distribution: per-shard
    weight sums land within one max-row-weight of total/n (the FFD/LPT
    balance target), beating hash-mod's row-count balance; output is
    still a stable permutation, deterministic across partitionings and
    bucket counts; zero/NULL weights are tolerated; all-zero raises."""
    import pytest

    # heavy tail: a few huge documents dominate the token mass
    rows = [(i, (i * 37) % 50 + 1) for i in range(1000)]
    rows += [(1000 + i, 5000 + 100 * i) for i in range(8)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    out = training_order(df, n_shards=8, salt="b", balance_col="n_tokens")
    got = out.collect()
    assert len(got) == len(rows)
    coords = {(r.shard, r.pos) for r in got}
    assert len(coords) == len(rows)  # still a permutation
    per = {}
    weights = dict(rows)
    for r in got:
        per[r.shard] = per.get(r.shard, 0) + weights[r.doc_id]
    assert set(per) == set(range(8))
    total = sum(weights.values())
    max_w = max(weights.values())
    for s, w in per.items():
        assert abs(w - total / 8) <= max_w, (s, w, total / 8)
    # hash-mod membership cannot make that guarantee here: the 8 huge
    # docs hash wherever they land, so its spread exceeds balanced's
    hash_per = {}
    for r in training_order(df, n_shards=8, salt="b").collect():
        hash_per[r.shard] = hash_per.get(r.shard, 0) + weights[r.doc_id]
    spread = max(per.values()) - min(per.values())
    hash_spread = max(hash_per.values()) - min(hash_per.values())
    assert spread < hash_spread
    # deterministic across input partitioning AND bucket granularity
    again = training_order(
        df.repartition(13), 8, salt="b", balance_col="n_tokens", n_buckets=64
    )
    assert {(r.doc_id, r.shard, r.pos) for r in again.collect()} == {
        (r.doc_id, r.shard, r.pos) for r in got
    }
    # NULL weights count as zero; all-zero weights raise
    with_null = df.withColumn(
        "n_tokens",
        F.when(F.col("doc_id") % 3 == 0, F.col("n_tokens")).otherwise(F.lit(None)),
    )
    assert training_order(
        with_null, 4, salt="b", balance_col="n_tokens"
    ).count() == len(rows)
    zero = df.withColumn("n_tokens", F.lit(0))
    with pytest.raises(ValueError, match="sums to 0"):
        training_order(zero, 4, salt="b", balance_col="n_tokens")
    with pytest.raises(ValueError, match="power of two"):
        training_order(df, 4, salt="b", balance_col="n_tokens", n_buckets=33)


def test_training_order_balanced_rejects_null_keys_and_negative_weights(spark):
    """A NULL key cannot be balance-sharded (its weight would inflate
    the total while no bucket offset covers it); negative weights would
    drive shard ids below zero — both raise."""
    import pytest

    df = spark.createDataFrame(
        [(1, 10), (None, 99999), (3, 10)], ["doc_id", "n_tokens"]
    )
    with pytest.raises(ValueError, match="NULL doc_id"):
        training_order(df, 4, balance_col="n_tokens")
    neg = spark.createDataFrame(
        [(1, 10), (2, -5), (3, 10)], ["doc_id", "n_tokens"]
    )
    with pytest.raises(Exception, match="negative n_tokens"):
        training_order(neg, 2, balance_col="n_tokens").collect()


def test_shards_manifest_written_and_verified(spark, tmp_path):
    """write_training_shards leaves a layout manifest beside the tree;
    verify_training_shards recounts and passes; a tampered tree (one
    shard directory deleted) fails; a manifest-less tree errors."""
    import shutil

    import pytest

    from colnade_spark.operators.shards import verify_training_shards

    df = spark.createDataFrame(
        [(i, f"t{i}", (i * 13) % 40 + 1) for i in range(300)],
        ["doc_id", "text", "n_tokens"],
    )
    dest = str(tmp_path / "shards")
    write_training_shards(df, dest, n_shards=4, salt="m", balance_col="n_tokens")
    mf = verify_training_shards(spark, dest)
    assert mf["n_shards"] == 4 and mf["salt"] == "m"
    assert mf["balance_col"] == "n_tokens"
    assert sum(mf["rows_per_shard"].values()) == 300
    # overwrite with different params replaces tree AND manifest
    write_training_shards(df, dest, n_shards=4, salt="other")
    assert verify_training_shards(spark, dest)["salt"] == "other"
    # tamper: drop one shard directory -> verification fails
    shutil.rmtree(f"{dest}/shard=2")
    with pytest.raises(ValueError, match="does not match its manifest"):
        verify_training_shards(spark, dest)
    # a tree nobody manifested errors
    df.write.parquet(str(tmp_path / "bare"))
    with pytest.raises(ValueError, match="no training-shards manifest"):
        verify_training_shards(spark, str(tmp_path / "bare"))


def test_shards_manifest_survives_dynamic_overwrite_mode(spark, tmp_path):
    """Under spark.sql.sources.partitionOverwriteMode=dynamic the data
    overwrite preserves root-level files — the writer must still
    replace the manifest so it describes the fresh tree."""
    from colnade_spark.operators.shards import verify_training_shards

    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(100)], ["doc_id", "text"]
    )
    dest = str(tmp_path / "shards")
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        write_training_shards(df, dest, n_shards=4, salt="a")
        assert verify_training_shards(spark, dest)["salt"] == "a"
        # re-shard with different params: manifest must follow the data
        write_training_shards(df, dest, n_shards=4, salt="b")
        mf = verify_training_shards(spark, dest)
        assert mf["salt"] == "b"
        assert sum(mf["rows_per_shard"].values()) == 100
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def test_shrinking_reshard_under_dynamic_overwrite_refuses(spark, tmp_path):
    """Dynamic overwrite only replaces the shard=i directories present
    in the new write: shrinking n_shards leaves the old tail dirs on
    disk. The writer must refuse (not fold the stale rows into a fresh
    manifest that verify would then bless)."""
    import pytest

    from colnade_spark.operators.shards import verify_training_shards

    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(100)], ["doc_id", "text"]
    )
    dest = str(tmp_path / "shards")
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        write_training_shards(df, dest, n_shards=8, salt="a")
        assert verify_training_shards(spark, dest)["n_shards"] == 8
        with pytest.raises(ValueError, match="stale shard directories"):
            write_training_shards(df, dest, n_shards=4, salt="a")
        # same-width and growing re-shards still work (all old dirs
        # are overwritten, nothing stale remains)
        write_training_shards(df, dest, n_shards=8, salt="b")
        assert verify_training_shards(spark, dest)["salt"] == "b"
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
