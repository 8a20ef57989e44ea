"""O13 reverse-DNS enrichment: left-outer semantics, distinct-address
resolution, and the production resolver's error contract
(ref: core/aggregator.go:68-75 — the block the reference ships
commented out as SLOW)."""

from __future__ import annotations

from pyspark.sql import Row

from takuan_spark.operators.enrich import default_rdns_resolver, rdns_enrich


def _make_fake():
    # defined inside a function so cloudpickle ships it by VALUE to
    # executors (a test-module-level function pickles by reference,
    # which executor workers cannot import)
    def fake(addr: str) -> str | None:
        if addr.endswith(".0"):
            return None  # simulated NXDOMAIN
        return f"ptr-{addr.replace('.', '-')}.example.net"

    return fake


def test_rdns_left_outer_keeps_unresolved_rows(spark):
    ev = spark.createDataFrame(
        [
            Row(event_id=1, address="10.0.0.1"),
            Row(event_id=2, address="10.0.0.0"),
            Row(event_id=3, address="10.0.0.1"),
        ]
    )
    got = {
        (r.event_id, r.hostname)
        for r in rdns_enrich(ev, resolver=_make_fake()).collect()
    }
    assert got == {
        (1, "ptr-10-0-0-1.example.net"),
        (2, None),
        (3, "ptr-10-0-0-1.example.net"),
    }


def test_rdns_resolves_each_distinct_address_once_in_plan(spark):
    ev = spark.createDataFrame(
        [Row(address=f"10.0.0.{i % 3}") for i in range(30)]
    )
    out = rdns_enrich(ev, resolver=_make_fake())
    assert out.count() == 30
    # the resolver side of the join is the distinct-address map
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Deduplicate" in plan or "Aggregate" in plan


def test_rdns_custom_columns(spark):
    ev = spark.createDataFrame([Row(ip="192.0.2.7")])
    row = rdns_enrich(
        ev, addr_col="ip", out_col="ptr", resolver=_make_fake()
    ).collect()[0]
    assert row.ptr == "ptr-192-0-2-7.example.net"


def test_default_resolver_returns_none_on_failure():
    # a resolver error (herror/gaierror/timeout) must map to None,
    # never raise — the reference's err-guard leaves Hostname unset.
    assert default_rdns_resolver("invalid-not-an-ip") is None


def test_default_resolver_none_address():
    assert default_rdns_resolver(None) is None


def test_rdns_null_address_does_not_crash(spark):
    # NULL addresses must never reach the resolver (a strict resolver
    # like socket.gethostbyaddr raises TypeError on None, aborting the
    # stage); the left join leaves hostname NULL for them.
    def strict(addr: str) -> str:
        assert addr is not None, "resolver saw a NULL address"
        return f"ptr-{addr.replace('.', '-')}.example.net"

    ev = spark.createDataFrame(
        [
            Row(event_id=1, address="10.0.0.1"),
            Row(event_id=2, address=None),
        ]
    )
    got = {
        (r.event_id, r.hostname)
        for r in rdns_enrich(ev, resolver=strict).collect()
    }
    assert got == {(1, "ptr-10-0-0-1.example.net"), (2, None)}
