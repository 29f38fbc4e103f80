"""Proxy rotation Columns vs the reference's iterator semantics
(proxy_strategy.py:12-67, 190-223)."""

from itertools import cycle

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.functions.proxies import (
    ProxyConfig,
    round_robin_proxy,
    session_proxy,
)


def test_from_string_parity():
    p4 = ProxyConfig.from_string("10.0.0.5:8080:alice:s3cret")
    assert p4.server == "http://10.0.0.5:8080"
    assert p4.username == "alice"
    assert p4.password == "s3cret"
    assert p4.ip == "10.0.0.5"
    p2 = ProxyConfig.from_string("10.0.0.6:3128")
    assert p2.server == "http://10.0.0.6:3128"
    assert p2.username is None and p2.ip == "10.0.0.6"
    with pytest.raises(ValueError):
        ProxyConfig.from_string("not-a-proxy")
    # ip extraction from server when not given (proxy_strategy.py:36-45)
    assert ProxyConfig(server="http://1.2.3.4:9").ip == "1.2.3.4"


def test_round_robin_matches_cycle(spark):
    proxies = [
        ProxyConfig.from_string(f"10.0.0.{i}:8080:u{i}:pw{i}")
        for i in range(1, 4)
    ]
    # the struct carries the FULL credential set
    df0 = spark.range(1).select(
        round_robin_proxy(F.lit(0), proxies).alias("proxy")
    )
    p0 = df0.collect()[0]["proxy"]
    assert p0["username"] == "u1" and p0["password"] == "pw1"
    assert p0["ip"] == "10.0.0.1"
    n = 10
    df = spark.range(n).select(F.col("id").alias("emit_seq"))
    got = [
        r["proxy"]["server"]
        for r in df.withColumn(
            "proxy", round_robin_proxy("emit_seq", proxies)
        ).orderBy("emit_seq").collect()
    ]
    it = cycle(proxies)
    want = [next(it).server for _ in range(n)]
    assert got == want


def test_session_proxy_sticky_and_epoch(spark):
    proxies = [
        ProxyConfig.from_string(f"10.0.0.{i}:8080") for i in range(1, 6)
    ]
    df = spark.createDataFrame(
        [(f"s{i % 7}", i) for i in range(50)], "session string, i int"
    )
    out = df.withColumn("proxy", session_proxy("session", proxies)).collect()
    by_session = {}
    for r in out:
        srv = r["proxy"]["server"]
        assert by_session.setdefault(r["session"], srv) == srv  # sticky
    out2 = {
        r["session"]: r["proxy"]["server"]
        for r in df.withColumn(
            "proxy", session_proxy("session", proxies, epoch=1)
        ).collect()
    }
    assert any(out2[s] != srv for s, srv in by_session.items())  # re-dealt
