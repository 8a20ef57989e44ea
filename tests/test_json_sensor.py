"""JSON-format sensor (engine extension): structured logs through the
same compile path — tokenize via JSON paths, rules/datetime/reports
unchanged."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from takuan_spark.config import ConfigError, config_from_dict
from takuan_spark.plans.compiler import compile_batch

JSON_CONF = {
    "name": "node1",
    "sensors": [
        {
            "name": "app",
            "filename": "/tmp/unused",
            "enabled": True,
            "parser": {
                "format": "json",
                "datetime_format": "2006-01-02 15:04:05",
                "tokens": {
                    "datetime": "time",
                    "address": "$.client.ip",
                    "msg": "message",
                },
            },
            "rules": [
                # rules compile as-is (reference parity: rule.go:17-21);
                # case-insensitivity is an explicit (?i) opt-in
                {"name": "denied", "token": "msg", "expression": "(?i)access denied"},
                {"name": "flood", "token": "msg", "expression": "rate limit"},
            ],
        }
    ],
}

LINES = [
    '{"time": "2026-08-13 10:00:01", "client": {"ip": "1.2.3.4"}, "message": "Access DENIED for user x"}',
    '{"time": "2026-08-13 10:00:02", "client": {"ip": "5.6.7.8"}, "message": "rate limit exceeded"}',
    '{"time": "2026-08-13 10:00:03", "client": {"ip": "9.9.9.9"}, "message": "all good"}',  # no rule
    '{"time": "2026-08-13 10:00:04", "message": "access denied"}',  # missing address -> dropped
    "not json at all",  # dropped by parse gate
]


@pytest.fixture(scope="module")
def json_logs(tmp_path_factory):
    d = tmp_path_factory.mktemp("jsonlogs")
    (d / "app.jsonl").write_text("\n".join(LINES) + "\n")
    return str(d)


def test_json_sensor_end_to_end(spark, json_logs):
    conf = config_from_dict(JSON_CONF, year=2026)
    ev = compile_batch(spark, conf, paths={"app": json_logs})
    rows = {r["address"]: r for r in ev.collect()}
    assert set(rows) == {"1.2.3.4", "5.6.7.8"}
    assert rows["1.2.3.4"]["rule"] == "denied"  # explicit (?i) in the rule
    assert rows["5.6.7.8"]["rule"] == "flood"
    assert rows["1.2.3.4"]["created_at"] == datetime(2026, 8, 13, 10, 0, 1)
    assert rows["1.2.3.4"]["sensor"] == "app"


def test_json_parser_validation():
    bad = dict(JSON_CONF)
    bad_parser = {
        "format": "json",
        "datetime_format": "2006",
        "tokens": {"datetime": "time"},  # no address
    }
    bad["sensors"] = [dict(JSON_CONF["sensors"][0], parser=bad_parser)]
    with pytest.raises(ConfigError, match="address"):
        config_from_dict(bad, year=2026)


def test_unknown_parser_format_rejected():
    bad = dict(JSON_CONF)
    p = dict(JSON_CONF["sensors"][0]["parser"], format="xml")
    bad["sensors"] = [dict(JSON_CONF["sensors"][0], parser=p)]
    with pytest.raises(ConfigError, match="unknown parser format"):
        config_from_dict(bad, year=2026)
