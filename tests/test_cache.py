"""Result-cache analog tests (reference middleware/cache.go:38-169): keyed
reuse, canonical key scheme, cache-hit plan (no new source scan), TTL
expiry, prefix invalidation."""

from __future__ import annotations

from pyspark.sql import functions as F

from otel_kafka_pg_spark.plans.cache import ResultCache, cache_key


def _build_fn(spark, sf_dir, calls):
    def build():
        calls.append(1)
        return (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    return build


def test_key_is_param_order_insensitive():
    a = cache_key("q", {"x": 1, "y": [2, 3]})
    b = cache_key("q", {"y": [2, 3], "x": 1})
    assert a == b and a.startswith("cache:q:") and len(a.split(":")[2]) == 16
    assert cache_key("q", {"x": 2, "y": [2, 3]}) != a


def test_second_request_served_from_cache(spark, sf_dir):
    calls = []
    cache = ResultCache()
    build = _build_fn(spark, sf_dir, calls)
    df1, hit1 = cache.get_or_build("svc", {"k": 1}, build)
    df2, hit2 = cache.get_or_build("svc", {"k": 1}, build)
    assert (not hit1) and hit2
    assert len(calls) == 1  # build ran once — the reference's cache-hit path
    # the hit's plan reads in-memory blocks, not the parquet source
    plan = df2._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
    assert df1.collect() == df2.collect()
    cache.invalidate()


def test_ttl_expiry_rebuilds(spark, sf_dir):
    calls = []
    cache = ResultCache(ttl_s=0.0)  # everything expires immediately
    build = _build_fn(spark, sf_dir, calls)
    _, hit1 = cache.get_or_build("svc", {"k": 1}, build)
    _, hit2 = cache.get_or_build("svc", {"k": 1}, build)
    assert not hit1 and not hit2 and len(calls) == 2
    cache.invalidate()


def test_prefix_invalidation(spark, sf_dir):
    calls = []
    cache = ResultCache()
    build = _build_fn(spark, sf_dir, calls)
    cache.get_or_build("svc", {"k": 1}, build)
    cache.get_or_build("svc", {"k": 2}, build)
    cache.get_or_build("other", {"k": 1}, build)
    assert cache.invalidate("cache:svc:") == 2  # one request family dropped
    _, hit = cache.get_or_build("other", {"k": 1}, build)
    assert hit  # untouched family still cached
    assert cache.invalidate() == 1
