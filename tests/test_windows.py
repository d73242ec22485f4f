

def test_seeded_split_keeps_user_rn_column(spark):
    """r14 review: the plain (non-scale_safe) path used fixed "_rn"/"_n"
    working names — a user column named _rn was silently overwritten and
    then dropped. Both paths now fresh-name."""
    from qcardia_data_spark.operators.windows import seeded_split

    df = spark.createDataFrame(
        [(i, f"keep{i}") for i in range(10)], ["sid", "_rn"]
    )
    out = seeded_split(df, "sid", valid_fraction=0.3)
    rows = out.collect()
    assert len(rows) == 10
    assert "_rn" in out.columns
    assert {r["_rn"] for r in rows} == {f"keep{i}" for i in range(10)}
    assert sum(r["split"] == "valid" for r in rows) == 3
