"""Skew mitigation: salted join / two-phase agg preserve results exactly
and spread the hot key; AQE skew-join stays enabled in the session."""

from pyspark.sql import functions as F

from qucosa_fcrepo_reportingdb_spark.operators.skew import (
    salted_join,
    two_phase_agg,
)


def skewed_df(spark, n=20000, hot_share=0.9):
    hot = int(n * hot_share)
    return spark.range(n).select(
        F.when(F.col("id") < hot, 0)
        .otherwise((F.col("id") % 100) + 1).alias("k"),
        (F.col("id") * 7 % 1000).alias("v"),
    )


def test_salted_join_equals_plain_join(spark):
    large = skewed_df(spark)
    small = spark.range(101).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    plain = large.join(small, ["k"], "inner")
    salted = salted_join(large, small, ["k"], "inner", n_salt=8)
    assert sorted(map(tuple, plain.collect())) \
        == sorted(map(tuple, salted.collect()))


def test_salted_join_left_preserves_unmatched(spark):
    large = skewed_df(spark, n=1000)
    small = spark.range(5).select(F.col("id").alias("k"),
                                  F.lit("x").alias("w"))
    plain = large.join(small, ["k"], "left")
    salted = salted_join(large, small, ["k"], "left", n_salt=4)
    assert sorted(map(tuple, plain.collect())) \
        == sorted(map(tuple, salted.collect()))


def test_two_phase_agg_matches_direct(spark):
    df = skewed_df(spark)
    direct = {tuple(r)[:1]: tuple(r)[1:] for r in
              df.groupBy("k").agg(F.sum("v").alias("sum_v"),
                                  F.count("v").alias("count_v"),
                                  F.min("v").alias("min_v"),
                                  F.max("v").alias("max_v")).collect()}
    two = {tuple(r)[:1]: tuple(r)[1:] for r in
           two_phase_agg(df, ["k"], {"v": "sum"}, n_salt=8)
           .join(two_phase_agg(df, ["k"], {"v": "count"}, n_salt=8), "k")
           .join(two_phase_agg(df, ["k"], {"v": "min"}, n_salt=8), "k")
           .join(two_phase_agg(df, ["k"], {"v": "max"}, n_salt=8), "k")
           .collect()}
    assert direct == two


def test_salt_spreads_hot_key(spark):
    large = skewed_df(spark)
    from qucosa_fcrepo_reportingdb_spark.operators.skew import (
        SALT,
        _content_salt,
    )
    shards = (large.filter(F.col("k") == 0)
              .withColumn(SALT, _content_salt(large, 8))
              .select(SALT).distinct().count())
    assert shards == 8


def test_salted_join_rejects_outer_joins(spark):
    """Right/full-outer through a salted join would emit one
    null-extended row PER SALT REPLICA for an unmatched small-side key —
    reject instead of silently corrupting."""
    import pytest as _pytest

    from qucosa_fcrepo_reportingdb_spark.operators.skew import salted_join

    big = spark.createDataFrame([(1, "a")], "k long, v string")
    small = spark.createDataFrame([(2, "x")], "k long, w string")
    with _pytest.raises(ValueError):
        salted_join(big, small, ["k"], how="full")
    with _pytest.raises(ValueError):
        salted_join(big, small, ["k"], how="right")


def test_content_salt_spreads_identical_rows(spark):
    """Byte-identical rows of a hot key (the common event-data shape)
    must spread across salt shards, not collapse onto one."""
    from qucosa_fcrepo_reportingdb_spark.operators.skew import _content_salt

    df = spark.range(0, 1000).selectExpr("CAST(1 AS LONG) AS k",
                                         "'same' AS v")
    n = df.select(_content_salt(df, 16).alias("s")) \
        .select("s").distinct().count()
    assert n > 4   # identical content, still spread over shards


# ---------------------------------------------------------------------------
# hot-bucket salted band candidates (dedup.salted_band_candidates)
# ---------------------------------------------------------------------------

def _band_frame(spark):
    """A banded signature frame with one deliberately hot bucket (50 rows
    on band value 0) and a spread of cold ones."""
    return spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.lit(0).alias("band_idx"),
        F.when(F.col("id") < 50, 0)
        .otherwise((F.col("id") % 30) + 1).alias("band_val"),
    )


def test_salted_band_candidates_equal_plain_self_join(spark):
    from qucosa_fcrepo_reportingdb_spark.operators.dedup import (
        salted_band_candidates,
    )
    bands = _band_frame(spark)
    a = bands.select(F.col("doc_id").alias("d1"), "band_idx", "band_val")
    b = bands.select(F.col("doc_id").alias("d2"), "band_idx", "band_val")
    plain = (a.join(b, ["band_idx", "band_val"])
             .filter(F.col("d1") < F.col("d2"))
             .select("d1", "d2").dropDuplicates(["d1", "d2"]))
    for cap in (2, 7, 1000):   # heavy salting, moderate, none (n_salt=1)
        salted = salted_band_candidates(
            bands, ["band_idx", "band_val"], cap=cap)
        assert sorted(map(tuple, salted.collect())) \
            == sorted(map(tuple, plain.collect())), f"cap={cap}"


def test_salted_band_candidates_orientation_not_lost(spark):
    """Regression pin for the orientation subtlety: with salt-ordered
    replication each unordered pair appears in ONE orientation, so a
    d1 < d2 filter (instead of least/greatest normalization) silently
    drops pairs whose lower-salt row has the higher doc_id. A bucket of
    consecutive ids with cap=1 puts every row in its own salt group and
    exercises both orientations."""
    from qucosa_fcrepo_reportingdb_spark.operators.dedup import (
        salted_band_candidates,
    )
    bands = spark.range(12).select(
        F.col("id").alias("doc_id"), F.lit(0).alias("band_idx"),
        F.lit(42).alias("band_val"))
    got = salted_band_candidates(bands, ["band_idx", "band_val"], cap=1)
    assert got.count() == 12 * 11 // 2   # every unordered pair, exactly once


def test_salted_band_candidates_cap_actually_splits(spark):
    """The sf-fixture cap must produce multi-salt buckets — otherwise the
    registry query never exercises the salting path it exists to prove."""
    from qucosa_fcrepo_reportingdb_spark.operators.dedup import (
        SALT_BUCKET_CAP,
    )
    from qucosa_fcrepo_reportingdb_spark.operators.dedup import (
        _shingled,
        band_signatures,
    )
    sf_dir = "/root/testdata/sf0.001"
    sh = _shingled(spark, sf_dir, non_empty=True)
    sizes = (band_signatures(sh)
             .groupBy("band_idx", "signature").count())
    hot = sizes.filter(F.col("count") > SALT_BUCKET_CAP).count()
    assert hot > 0, (
        "no band bucket exceeds SALT_BUCKET_CAP at sf0.001 — raise the "
        "fixture scale or lower the cap so the salted path is exercised")
