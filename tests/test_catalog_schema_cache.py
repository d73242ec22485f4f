"""catalog.load_table's per-session parquet SCHEMA cache (r16, guide §5/§6):
metadata-only — the cached-read DataFrame must be indistinguishable from the
inferred-read one, and misses must fail exactly like the plain reader."""

from __future__ import annotations

import pytest

import qcardia_data_spark.catalog as C


def _fresh(spark, sf_dir, name):
    C._SCHEMA_CACHE.clear()
    df = C.load_table(spark, sf_dir, name)
    assert any(k[1].endswith(f"{name}.parquet") for k in C._SCHEMA_CACHE)
    return df


def test_cached_read_equals_inferred_read(spark, sf_dir):
    for name in ("events", "lineitem", "documents"):
        inferred = _fresh(spark, sf_dir, name)  # populates the cache
        cached = C.load_table(spark, sf_dir, name)  # served from it
        assert cached.schema == inferred.schema
        a = inferred.limit(5).collect()
        b = cached.limit(5).collect()
        assert a == b
    # events keeps its timestamp handling on the cached path (TIMESTAMP_NTZ
    # on Spark 4.1.2; the nanosAsLong->micros branch on older readers —
    # either way a timestamp type, never raw bigint)
    ev = C.load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"].startswith("timestamp")


def test_missing_path_raises_like_plain_reader(spark, tmp_path):
    C._SCHEMA_CACHE.clear()
    with pytest.raises(Exception, match="PATH_NOT_FOUND|does not exist"):
        C.load_table(spark, str(tmp_path / "nope"), "events")
    # a failed read must not poison the cache
    assert not any("nope" in k[1] for k in C._SCHEMA_CACHE)


def test_cache_is_metadata_only_and_session_keyed(spark, sf_dir):
    C._SCHEMA_CACHE.clear()
    C.load_table(spark, sf_dir, "region")
    ((app_id, path), schema), = list(C._SCHEMA_CACHE.items())
    assert app_id == spark.sparkContext.applicationId
    assert path.endswith("region.parquet")
    # a StructType, not rows/bytes
    from pyspark.sql.types import StructType

    assert isinstance(schema, StructType)
