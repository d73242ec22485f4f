"""Z-order layout tests: interleave math, file-stat locality (the property
min/max pruning exploits), and the write path."""

from __future__ import annotations

from pyspark.sql import functions as F

from qcardia_data_spark.plans.layout import file_stats, z_value, zorder_write


def test_z_value_interleave_math(spark):
    # MSB-first Morton, equal 6-bit widths: x bit i -> z bit 2i+1,
    # y bit i -> z bit 2i (x=0b11, y=0b01 -> z=0b1011 = 11)
    rows = [(0b11, 0b01), (0, 0), (0b10, 0b10), (63, 63)]
    df = spark.createDataFrame(rows, ["x", "y"])
    out = [
        r["z"]
        for r in df.select(
            z_value([F.col("x"), F.col("y")], bits=6).alias("z")
        ).collect()
    ]

    def ref(x, y):
        z = 0
        for i in range(6):
            z |= ((x >> i) & 1) << (2 * i + 1)
            z |= ((y >> i) & 1) << (2 * i)
        return z

    assert out == [ref(x, y) for x, y in rows]
    assert out[0] == 0b1011 == 11
    assert out[3] == (1 << 12) - 1  # all 12 bits set


def test_z_value_variable_widths_put_every_column_on_top(spark):
    # widths [4, 6]: round 0 takes u bit 3 and v bit 5 -> the TOP TWO z bits
    # are u's and v's most significant bits (the property that makes the
    # prefix split both dimensions)
    from qcardia_data_spark.plans.layout import morton_positions

    pos = morton_positions([4, 6])
    top_two = sorted(pos, key=lambda t: -t[2])[:2]
    assert {(j, i) for j, i, _ in top_two} == {(0, 3), (1, 5)}


def test_z_value_rejects_overflow(spark):
    import pytest

    with pytest.raises(ValueError, match="64-bit"):
        z_value([F.col("a"), F.col("b")], bits=32)


def test_zorder_layout_confines_keys_to_few_files(spark, sf_dir, tmp_path):
    """The pruning property itself: after zorder_write on (user, value)
    buckets, each user bucket's rows span a strict subset of files (file
    min/max on z are selective), while a hash-shuffled layout spreads every
    user across ~all files."""
    import os

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_id", "user_id", "value"
    )
    n_files = 8

    zpath = str(tmp_path / "zordered")
    # widths sized to real cardinality (the z_value docstring rule): the
    # testdata has ~15 users -> 4 bits; value buckets use 6
    zorder_write(
        ev, zpath,
        buckets={
            "u": (F.col("user_id") % 16).cast("long"),
            "v": F.floor(F.abs(F.col("value")) * 10).cast("long") % 64,
        },
        bits=[4, 6], n_files=n_files,
    )
    hpath = str(tmp_path / "hashed")
    ev.repartition(n_files).write.parquet(hpath)

    def files_per_user(path):
        df = spark.read.parquet(path)
        per_file = (
            df.withColumn("f", F.input_file_name())
            .groupBy("user_id").agg(F.countDistinct("f").alias("nf"))
        )
        return per_file.agg(F.avg("nf")).collect()[0][0]

    z_avg = files_per_user(zpath)
    h_avg = files_per_user(hpath)
    assert h_avg > 0.8 * n_files  # hash layout: every user in ~all files
    assert z_avg < 0.6 * h_avg  # z-order: users confined to far fewer files

    # file-level z stats are disjoint-ish ranges (range partition worked):
    # read each file's user_id min/max — at least one file must EXCLUDE the
    # smallest user entirely (otherwise no file-level pruning is possible)
    stats = file_stats(spark, zpath, "user_id")
    assert len(stats) == n_files
    first_user = ev.agg(F.min("user_id")).collect()[0][0]
    assert any(mn > first_user for _, mn, mx in stats)


def test_z_value_bijective_and_coordinate_monotone(spark):
    # full 4x4 grid with bits=[2,2]: the Morton map is a bijection onto
    # 0..15, and increasing one coordinate with the other fixed increases z
    rows = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", z_value([F.col("x"), F.col("y")], bits=[2, 2]).alias("z")
        ).collect()
    }
    assert sorted(got.values()) == list(range(16))  # bijection
    for y in range(4):
        zs = [got[(x, y)] for x in range(4)]
        assert zs == sorted(zs)  # monotone in x for fixed y
    for x in range(4):
        zs = [got[(x, y)] for y in range(4)]
        assert zs == sorted(zs)  # monotone in y for fixed x


def test_compact_files_coalesce_and_range_layouts(spark, sf_dir, tmp_path):
    """compact_files must size output from real compressed bytes, round-trip
    rows exactly, keep the default path shuffle-free (coalesce), and make
    per-file min/max ranges non-overlapping in order_by mode."""
    import os

    from qcardia_data_spark.plans.layout import compact_files, file_stats

    src = str(tmp_path / "fragmented")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs.repartition(40).write.parquet(src)  # 40 tiny files
    n_src = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_src == 40

    total_mb = sum(
        os.path.getsize(os.path.join(src, f))
        for f in os.listdir(src) if f.endswith(".parquet")
    ) / (1024 * 1024)
    target = max(1, int(total_mb / 3) + 1)  # aim for ~3-4 files

    dst = str(tmp_path / "compacted")
    n_out = compact_files(spark, src, dst, target_mb=target)
    files = [f for f in os.listdir(dst) if f.endswith(".parquet")]
    assert len(files) == n_out < n_src
    # round-trip equality
    assert sorted(map(tuple, spark.read.parquet(dst).collect())) == sorted(
        map(tuple, docs.collect())
    )

    dst2 = str(tmp_path / "compacted_ordered")
    n2 = compact_files(spark, src, dst2, target_mb=target, order_by=["doc_id"])
    stats = file_stats(spark, dst2, "doc_id")
    assert len(stats) == n2
    # ranges sorted by min must be non-overlapping: layout doubles as pruning
    stats.sort(key=lambda s: s[1])
    for (_, _, hi), (_, lo, _) in zip(stats, stats[1:]):
        assert hi < lo
    assert sorted(map(tuple, spark.read.parquet(dst2).collect())) == sorted(
        map(tuple, docs.collect())
    )

    # missing/empty sources: spark.read.parquet itself refuses loudly
    # (AnalysisException) before the file-count guard is reached


def test_zorder_prefix_clamped_when_bits_exhausted(spark, sf_dir, tmp_path):
    """r11: n_files demanding more prefix bits than the curve has used to
    shift by a NEGATIVE count (Java masks to 63 => every _zb = 0,
    boundaries degrade to raw-z). Clamped now: the write must succeed and
    preserve rows with 2x1-bit buckets and n_files=8."""
    import pyspark.sql.functions as F

    from qcardia_data_spark.plans.layout import zorder_write

    df = (
        spark.read.parquet(sf_dir + "/events.parquet")
        .limit(1000)
        .withColumn("b1", (F.col("user_id") % 2).cast("long"))
        .withColumn("b2", (F.col("event_id") % 2).cast("long"))
    )
    out = str(tmp_path / "z_clamped")
    zorder_write(df, out, {"b1": F.col("b1"), "b2": F.col("b2")},
                 bits=[1, 1], n_files=8)
    back = spark.read.parquet(out)
    assert back.count() == df.count()
