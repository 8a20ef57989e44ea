"""End-to-end test of the service CLI (``python -m takuan_spark``) —
the runnable analog of the reference binary (cmd/takuan/main.go):
config → streaming pipeline over chunked logs → events table + report
CSV + country summary on stdout, plus the ``--geo`` re-enrich batch
mode."""

from __future__ import annotations

import glob

import pandas as pd
import pytest

from takuan_spark.__main__ import main

CONFIG_TMPL = """
name: 'cli-test-node'
database:
  period: 5
reports:
  enabled: true
  period: 60
sensors:
- name: ssh
  filename: {ssh_dir}
  enabled: true
  parser:
    expression: '^(.+)\\s+.+\\s+sshd\\[\\d+\\]: (.+)\\s+(.+)\\s+port\\s+\\d+$'
    datetime_format: '2006 Jan _2 15:04:05'
    tokens:
      datetime: 1
      message: 2
      address: 3
  rules:
    - name: 'auth-failure'
      token: message
      expression: 'Authentication (failure|error|failed) for .+'
    - name: 'user-enumeration'
      token: message
      expression: '(Illegal|Invalid) user .+'
"""

AUTH_LINES = [
    "Aug 13 06:15:01 host1 sshd[1234]: Authentication failed for invalid user admin from 203.0.113.7 port 22",
    "Aug 13 06:15:03 host1 sshd[1235]: Invalid user oracle from 198.51.100.23 port 22",
    "Aug 13 06:15:04 host1 sshd[1236]: Authentication failure for Invalid user bob from 203.0.113.7 port 22",
    "Aug 13 06:15:07 host1 sshd[1237]: Accepted password for root from 10.0.0.1 port 22",
]


@pytest.fixture()
def cli_env(tmp_path):
    ssh = tmp_path / "ssh-chunks"
    ssh.mkdir()
    (ssh / "auth.log.1").write_text("\n".join(AUTH_LINES) + "\n")
    cfg = tmp_path / "takuan.yml"
    cfg.write_text(CONFIG_TMPL.format(ssh_dir=ssh))
    return {"cfg": str(cfg), "out": str(tmp_path / "out"), "tmp": tmp_path}


def test_cli_batch_mode_end_to_end(spark, cli_env, capsys):
    rc = main(["--config", cli_env["cfg"], "--out", cli_env["out"], "--batch"])
    assert rc == 0

    events = spark.read.parquet(f"{cli_env['out']}/events")
    rows = {(r["address"], r["rule"]) for r in events.collect()}
    # 3 rule-hit lines -> 3 events; first-match-wins on the double hit
    assert rows == {
        ("203.0.113.7", "auth-failure"),
        ("198.51.100.23", "user-enumeration"),
    }
    assert events.count() == 3

    # write_csv_report writes a directory (Spark CSV sink) with one part
    parts = glob.glob(f"{cli_env['out']}/reports/address_report_*.csv/part-*.csv")
    assert parts, "report CSV not written"
    rep = pd.read_csv(parts[0])
    assert set(rep["address"]) == {"203.0.113.7", "198.51.100.23"}
    assert rep.loc[rep["address"] == "203.0.113.7", "total_events"].iloc[0] == 2

    # the reference's tweet text (with emoji flag fallback) on stdout
    out = capsys.readouterr().out
    assert "3 events:" in out


def test_cli_batch_mode_with_db_sink(spark, cli_env, capsys):
    import duckdb

    db = str(cli_env["tmp"] / "events.duckdb")
    rc = main(
        ["--config", cli_env["cfg"], "--out", cli_env["out"], "--batch", "--db", db]
    )
    assert rc == 0
    con = duckdb.connect(db)
    assert con.sql("SELECT COUNT(*) FROM events").fetchone()[0] == 3
    # rerun with the same checkpoint: no new batches, no duplicate rows
    con.close()
    rc = main(
        ["--config", cli_env["cfg"], "--out", cli_env["out"], "--batch", "--db", db]
    )
    assert rc == 0
    con = duckdb.connect(db)
    assert con.sql("SELECT COUNT(*) FROM events").fetchone()[0] == 3
    con.close()


def test_cli_batch_mode_with_jdbc_sink(spark, cli_env, capsys):
    url = f"jdbc:derby:{cli_env['tmp']}/jdbc_db;create=true"
    argv = [
        "--config", cli_env["cfg"], "--out", cli_env["out"], "--batch",
        "--jdbc-url", url,
    ]
    assert main(argv) == 0

    def count():
        return (
            spark.read.format("jdbc")
            .options(
                url=url, dbtable="events",
                driver="org.apache.derby.jdbc.EmbeddedDriver",
            )
            .load()
            .count()
        )

    assert count() == 3
    # rerun with the same checkpoint: no new batches, no duplicate rows
    assert main(argv) == 0
    assert count() == 3


def test_cli_geo_batch_mode(spark, cli_env, capsys):
    rc = main(["--config", cli_env["cfg"], "--out", cli_env["out"], "--batch"])
    assert rc == 0
    geo_csv = cli_env["tmp"] / "geo.csv"
    geo_csv.write_text(
        "ip,country_code,country_name\n203.0.113.7,CN,China\n"
    )
    rc = main(
        [
            "--config", cli_env["cfg"],
            "--out", cli_env["out"],
            "--geo",
            "--geo-dim", str(geo_csv),
        ]
    )
    assert rc == 0
    events = spark.read.parquet(f"{cli_env['out']}/events")
    cc = {
        r["address"]: r["country_code"]
        for r in events.select("address", "country_code").distinct().collect()
    }
    assert cc["203.0.113.7"] == "CN"  # refreshed by the lookup
    assert cc["198.51.100.23"] is None  # no dim row -> left as-is


def test_cli_tail_mode_end_to_end(spark, cli_env, tmp_path, capsys):
    """--tail consumes each sensor filename as ONE live log file via the
    byte-offset filetail source; --batch drains and exits."""
    log = tmp_path / "single-auth.log"
    log.write_text("\n".join(AUTH_LINES) + "\n")
    cfg = tmp_path / "tail.yml"
    cfg.write_text(CONFIG_TMPL.format(ssh_dir=log))
    rc = main(
        [
            "--config", str(cfg),
            "--out", cli_env["out"],
            "--batch",
            "--tail",
        ]
    )
    assert rc == 0
    events = spark.read.parquet(f"{cli_env['out']}/events")
    assert events.count() == 3  # same three rule-matched lines as chunk mode
    assert {r["address"] for r in events.select("address").collect()} == {
        "203.0.113.7", "198.51.100.23",
    }


def test_cli_sql_mode(spark, tmp_path, capsys):
    rc = main(
        [
            "--sql",
            "SELECT r_name FROM region ORDER BY r_name LIMIT 2",
            "--tables",
            "/root/testdata/sf0.001",
            "--out",
            str(tmp_path / "none"),
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0] == "r_name"
    assert out[1] == "AFRICA" and out[2] == "AMERICA"


def test_cli_sql_mode_requires_config_elsewhere(tmp_path):
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(["--batch", "--out", str(tmp_path)])


def test_cli_sql_mode_bad_tables_dir_is_clean_error(tmp_path, capsys):
    rc = main(
        ["--sql", "SELECT 1", "--tables", str(tmp_path / "nope"),
         "--out", str(tmp_path)]
    )
    assert rc == 2
    assert "not found" in capsys.readouterr().err


def test_cli_sql_mode_view_name_collision_is_error(spark, tmp_path, capsys):
    # "a-b.parquet" and "a_b.parquet" both sanitize to view a_b: the
    # session must refuse (silent last-wins shadowing would let a query
    # read the wrong table).
    tables = tmp_path / "tables"
    tables.mkdir()
    spark.range(1).write.parquet(str(tables / "a-b.parquet"))
    spark.range(2).write.parquet(str(tables / "a_b.parquet"))
    rc = main(
        ["--sql", "SELECT COUNT(*) AS n FROM a_b", "--tables",
         str(tables), "--out", str(tmp_path / "out")]
    )
    assert rc == 2
    err = capsys.readouterr().err
    assert "a_b" in err and "rename" in err
