"""Cost-based optimization evidence (SURVEY §4: the reference has no
optimizer; Spark's CBO is one of the things the engine gets for free).
Pins that ANALYZE TABLE statistics reach the optimized plan, giving
Catalyst row counts for join reordering and build-side selection."""

from pyspark.sql import functions as F


def _stats(df):
    return df._jdf.queryExecution().optimizedPlan().stats()


def test_analyze_produces_rowcount_stats(spark, tmp_path):
    from quick_stream_spark.sources.readers import load_table
    from tests.conftest import SF_SMOKE

    prev = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        load_table(spark, SF_SMOKE, "orders").write.mode("overwrite").saveAsTable(
            "cbo_orders_t"
        )
        spark.sql("ANALYZE TABLE cbo_orders_t COMPUTE STATISTICS FOR ALL COLUMNS")
        stats = _stats(spark.table("cbo_orders_t"))
        assert stats.rowCount().isDefined()
        n = int(str(stats.rowCount().get()))
        assert n == spark.table("cbo_orders_t").count()
        # a selective filter's estimate must shrink below the table size
        filtered = _stats(
            spark.table("cbo_orders_t").filter(F.col("o_orderkey") <= 10)
        )
        assert filtered.rowCount().isDefined()
        assert int(str(filtered.rowCount().get())) < n
    finally:
        spark.conf.set("spark.sql.cbo.enabled", prev)
        spark.sql("DROP TABLE IF EXISTS cbo_orders_t")
