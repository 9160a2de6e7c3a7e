

def test_frequent_items_exact_keeps_null_group(spark):
    """ADVICE r1: a NULL key meeting the threshold must survive — a
    plain semi join on the key column silently drops it."""
    from hadron_spark.operators.sketch import frequent_items_exact

    df = spark.createDataFrame(
        [(None,)] * 5 + [("a",)] * 4 + [("b",)] * 1, "k string"
    )
    got = {r["k"]: r["cnt"] for r in frequent_items_exact(df, "k", 3).collect()}
    assert got == {None: 5, "a": 4}


def test_bloom_prefilter_join_rejects_row_dropping_hows(spark):
    from hadron_spark.operators.joins import bloom_prefilter_join

    f = spark.createDataFrame([(1,)], "k long")
    d = spark.createDataFrame([(1,)], "k long")
    import pytest

    with pytest.raises(ValueError, match="only preserves"):
        bloom_prefilter_join(f, d, "k", "k", how="left")
