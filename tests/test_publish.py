"""Report publication hooks (ref: core/reporter.go:120-207 git drop,
core/twitter.go:82-99 status post)."""

from __future__ import annotations

import csv
import http.server
import json
import subprocess
import threading

import pytest

from takuan_spark.sinks.publish import (
    REPORT_COLUMNS,
    drop_report_csv,
    git_publish,
    publication_hook,
)


@pytest.fixture()
def events(spark):
    rows = [
        ("203.0.113.7", "CN", "China", "ssh", "auth-failure"),
        ("203.0.113.7", "CN", "China", "ssh", "auth-failure"),
        ("203.0.113.7", "CN", "China", "http", "php_files_scan"),
        ("198.51.100.23", None, None, "ssh", "user-enumeration"),
    ]
    return spark.createDataFrame(
        rows, "address string, country_code string, country_name string, "
        "sensor string, rule string"
    )


def test_drop_report_csv_shape(spark, events, tmp_path):
    from takuan_spark.operators.reports import address_report

    path = drop_report_csv(address_report(events), str(tmp_path))
    with open(path) as fp:
        rows = list(csv.reader(fp))
    assert rows[0] == REPORT_COLUMNS
    # sorted by total_events desc; reference counters encoding
    assert rows[1][0] == "203.0.113.7"
    assert rows[1][3] == "3"
    assert rows[1][4] == "http/php_files_scan:1|ssh/auth-failure:2"
    assert rows[2][0] == "198.51.100.23"
    assert not path.endswith(".tmp")


def test_git_publish_commits_with_reference_message(spark, events, tmp_path):
    from takuan_spark.operators.reports import address_report

    repo = tmp_path / "reports-repo"
    repo.mkdir()
    subprocess.run(["git", "-C", str(repo), "init", "-q"], check=True)
    path = drop_report_csv(address_report(events), str(repo))
    git_publish(path, n_addresses=2, n_events=4)
    log = subprocess.run(
        ["git", "-C", str(repo), "log", "--format=%s", "-1"],
        check=True, capture_output=True, text=True,
    ).stdout.strip()
    assert log == "reporting 2 addresses, 4 total events"
    clean = subprocess.run(
        ["git", "-C", str(repo), "status", "--porcelain"],
        check=True, capture_output=True, text=True,
    ).stdout.strip()
    assert clean == ""


def test_publication_hook_end_to_end_with_webhook(spark, events, tmp_path):
    received = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            received.append(json.loads(body))
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):  # quiet
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        hook = publication_hook(
            repo_dir=str(tmp_path),
            webhook_url=f"http://127.0.0.1:{srv.server_port}/report",
        )
        hook(events, epoch_id=7)
    finally:
        srv.shutdown()

    assert len(received) == 1
    payload = received[0]
    assert payload["epoch_id"] == 7
    assert payload["n_addresses"] == 2
    assert payload["n_events"] == 4
    assert payload["report_file"].startswith("report_")
    assert "4 events:" in payload["status"]
