"""Transport tests (D1/D2 production path): hermetic unit tests with an
injected clock, plus an end-to-end collect_run against a real local HTTP
server (flaky + missing endpoints) exercising the retry and rate-limit
paths through Spark partitions."""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from pyspark.sql import functions as F

from citydata_etl_spark.etl.transport import (
    HttpTransport,
    TokenBucket,
    TransportError,
    http_transport_factory,
    rate_limits_from_config,
)


class FakeClock:
    def __init__(self):
        self.t = 1000.0
        self.sleeps: list[float] = []

    def monotonic(self) -> float:
        return self.t

    def sleep(self, s: float) -> None:
        self.sleeps.append(s)
        self.t += s


def test_token_bucket_paces_per_host():
    clk = FakeClock()
    b = TokenBucket({"a.com": 10.0}, default_interval=1.0,
                    monotonic=clk.monotonic, sleep=clk.sleep)
    assert b.acquire("a.com") == 0.0           # first call free
    assert b.acquire("a.com") == 10.0          # paced by host interval
    assert b.acquire("b.com") == 0.0           # other hosts independent
    assert b.acquire("b.com") == 1.0           # default interval applies


def _transport_with(responses, clk, **kw):
    """HttpTransport with a scripted getter: responses is a list popped per
    call — each entry is (status, text) or an Exception to raise."""
    calls = []

    def getter(url, timeout):
        calls.append(url)
        r = responses.pop(0)
        if isinstance(r, Exception):
            raise r
        return r

    t = HttpTransport(monotonic=clk.monotonic, sleep=clk.sleep,
                      getter=getter, **kw)
    return t, calls


def test_retry_backoff_mirrors_stepfunction_policy():
    # IntervalSeconds=30, BackoffRate=1 (definition.json:13-23): two
    # transient failures -> two 30 s sleeps, then success
    clk = FakeClock()
    t, calls = _transport_with(
        [(500, ""), (TimeoutError("slow")), (200, "payload")], clk,
        max_attempts=10, interval_s=30.0, backoff_rate=1.0,
    )
    assert t("http://x.com/p") == "payload"
    assert len(calls) == 3
    assert clk.sleeps == [30.0, 30.0]


def test_retry_backoff_rate_multiplies():
    clk = FakeClock()
    t, _ = _transport_with(
        [(503, ""), (502, ""), (200, "ok")], clk,
        max_attempts=5, interval_s=2.0, backoff_rate=3.0,
    )
    assert t("http://x.com/p") == "ok"
    assert clk.sleeps == [2.0, 6.0]


def test_permanent_4xx_fails_immediately():
    clk = FakeClock()
    t, calls = _transport_with([(404, "")], clk, max_attempts=10)
    with pytest.raises(TransportError, match="HTTP 404"):
        t("http://x.com/missing")
    assert len(calls) == 1 and clk.sleeps == []


def test_exhausted_attempts_raise():
    clk = FakeClock()
    t, calls = _transport_with(
        [(500, "")] * 3, clk, max_attempts=3, interval_s=1.0,
    )
    with pytest.raises(TransportError, match="after 3 attempts"):
        t("http://x.com/down")
    assert len(calls) == 3


def test_rate_limits_from_reference_config():
    cfg = {
        "website": {
            "city-data": {"url": "https://www.city-data.com/",
                          "scrape_interval": 3600},
            "usa": {"url": "http://www.usa.com/", "scrape_interval": 7200},
        },
        "api": {"greatschools": {"endpoint": "https://x/"}},
    }
    assert rate_limits_from_config(cfg) == {
        "www.city-data.com": 3600.0,
        "www.usa.com": 7200.0,
    }


# ---------------------------------------------------------------- e2e ----


class _Handler(BaseHTTPRequestHandler):
    hits: dict[str, int] = {}
    lock = threading.Lock()

    def do_GET(self):  # noqa: N802 (stdlib naming)
        with _Handler.lock:
            n = _Handler.hits[self.path] = _Handler.hits.get(self.path, 0) + 1
        if self.path.startswith("/flaky") and n <= 2:
            self.send_response(503)
            self.end_headers()
            return
        if self.path.startswith("/missing"):
            self.send_response(404)
            self.end_headers()
            return
        body = f"<html><div id='content'>payload {self.path}</div></html>"
        self.send_response(200)
        self.send_header("Content-Type", "text/html")
        self.end_headers()
        self.wfile.write(body.encode())

    def log_message(self, *a):  # silence server chatter
        pass


@pytest.fixture()
def http_server():
    _Handler.hits = {}
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_collect_run_with_http_transport(spark, http_server):
    """End-to-end: pending rows fetched over real HTTP through the
    partition-scoped transport — the flaky URL succeeds after retries, the
    missing URL routes to 'error', and per-host pacing throttles request
    issue."""
    from citydata_etl_spark import schemas
    from citydata_etl_spark.etl.collect import collect_run

    rows = [
        (1, "S1", "CityA", "", None, f"{http_server}/page/a"),
        (2, "S1", "CityB", "", None, f"{http_server}/flaky"),
        (3, "S2", "CityC", "", None, f"{http_server}/missing"),
        (4, "S2", "CityD", "completed", "2021-04-24 17:03:38",
         f"{http_server}/page/d"),  # not pending: must not be fetched
    ]
    control = spark.createDataFrame(rows, schemas.CITYDATA_CONTROL)
    factory = http_transport_factory(
        default_interval=0.05,   # pace all requests through the bucket
        interval_s=0.05,         # fast retries for the test
        max_attempts=5,
        timeout_s=10.0,
    )
    raw, updated = collect_run(control, factory, "website", "city-data")
    payloads = {r["city"]: r["payload"] for r in raw.collect()}
    status = {r["id"]: r["status"] for r in updated.collect()}

    assert "payload /page/a" in payloads["CityA"]
    assert "payload /flaky" in payloads["CityB"]       # retried to success
    assert "CityC" not in payloads                     # permanent failure
    assert status[1] == "completed"
    assert status[2] == "completed"
    assert status[3] == "error"                        # routed, not raised
    assert status[4] == "completed"                    # untouched

    assert _Handler.hits["/flaky"] == 3                # 2 failures + success
    assert "/page/d" not in _Handler.hits              # non-pending skipped