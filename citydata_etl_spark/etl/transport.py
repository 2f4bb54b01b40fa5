"""Production fetch transport for the collection pipeline (D1/D2).

The reference's core job is fetching pages/APIs with selenium + requests
(reference lambda/collect-data.py:66-109), one browser per row, retried at
the step-function level (reference stepfunction/definition.json:13-23:
IntervalSeconds=30, BackoffRate=1, MaxAttempts=10) and paced by the
per-site scrape_interval (reference config.json:7,13).

This module is the engine-side equivalent, shaped for mapInPandas
partitions (etl/collect.py:fetch_pending — ONE transport per partition):

  - HttpTransport: url -> payload text. requests-backed (urllib fallback),
    connection reuse via a per-transport session.
  - per-HOST token bucket honoring a configurable min interval
    (rate_limits={host: seconds}, default_interval for unknown hosts) —
    scrape_interval's politeness contract applied at request granularity.
  - retry with backoff mirroring the step-function policy: transient
    failures (5xx, timeouts, connection errors) retry up to max_attempts
    with interval_s * backoff_rate**(attempt-1) sleeps; permanent HTTP
    errors (4xx) fail immediately.

Scale note: the bucket is per-transport, hence per-partition. With P
concurrent partitions touching one host, divide the host budget by the
partition count (or repartition the work by host — urls.repartition(
F.col("host")) — so each host's requests serialize through one bucket).
A genuinely global limiter needs external coordination and is out of
scope for an embarrassingly-parallel fetch stage.

Clock and sleep are injectable, so tests run hermetically and instantly.
"""

from __future__ import annotations

import time
from collections.abc import Callable


class TransportError(Exception):
    """Fetch failed permanently (4xx) or exhausted its retry budget."""


class TokenBucket:
    """Minimal per-key pacing: at most one acquire per `interval` seconds
    per key; acquire() sleeps just long enough to honor it."""

    def __init__(
        self,
        intervals: dict[str, float],
        default_interval: float = 0.0,
        monotonic: Callable[[], float] = time.monotonic,
        sleep: Callable[[float], None] = time.sleep,
    ):
        self._intervals = dict(intervals)
        self._default = default_interval
        self._monotonic = monotonic
        self._sleep = sleep
        self._next_ok: dict[str, float] = {}

    def acquire(self, key: str) -> float:
        """Block until `key` may proceed; returns the seconds slept."""
        interval = self._intervals.get(key, self._default)
        now = self._monotonic()
        wait = max(0.0, self._next_ok.get(key, now) - now)
        if wait > 0:
            self._sleep(wait)
        self._next_ok[key] = max(now, self._next_ok.get(key, now)) + interval
        return wait


def _host_of(url: str) -> str:
    from urllib.parse import urlparse

    return urlparse(url).netloc or url


class HttpTransport:
    """url -> payload text, rate-limited per host, retried with backoff.

    Defaults mirror the reference step-function retry policy
    (stepfunction/definition.json:13-23). A 4xx response raises
    TransportError immediately (permanent); 5xx / timeouts / connection
    errors retry. After max_attempts the last error propagates as
    TransportError — etl/collect.py routes it to status='error' (U3),
    exactly like the reference's failure path.
    """

    RETRYABLE_STATUS = frozenset({500, 502, 503, 504, 429})

    def __init__(
        self,
        rate_limits: dict[str, float] | None = None,
        default_interval: float = 0.0,
        timeout_s: float = 30.0,
        max_attempts: int = 10,
        interval_s: float = 30.0,
        backoff_rate: float = 1.0,
        monotonic: Callable[[], float] = time.monotonic,
        sleep: Callable[[float], None] = time.sleep,
        getter: Callable[[str, float], tuple[int, str]] | None = None,
    ):
        self._bucket = TokenBucket(
            rate_limits or {}, default_interval, monotonic, sleep
        )
        self._timeout_s = timeout_s
        self._max_attempts = max_attempts
        self._interval_s = interval_s
        self._backoff_rate = backoff_rate
        self._sleep = sleep
        self._get = getter or self._default_getter()

    @staticmethod
    def _default_getter() -> Callable[[str, float], tuple[int, str]]:
        """(url, timeout) -> (status, text). requests with a shared
        session (connection reuse across a partition's rows); stdlib
        urllib fallback when requests is absent."""
        try:
            import requests

            session = requests.Session()

            def get(url: str, timeout: float) -> tuple[int, str]:
                r = session.get(url, timeout=timeout)
                return r.status_code, r.text

            return get
        except ImportError:  # pragma: no cover - requests is baked in
            from urllib.error import HTTPError
            from urllib.request import urlopen

            def get(url: str, timeout: float) -> tuple[int, str]:
                try:
                    with urlopen(url, timeout=timeout) as resp:
                        return resp.status, resp.read().decode(
                            "utf-8", "replace"
                        )
                except HTTPError as e:
                    return e.code, ""

            return get

    def __call__(self, url: str) -> str:
        host = _host_of(url)
        last_err: str = ""
        for attempt in range(1, self._max_attempts + 1):
            self._bucket.acquire(host)
            try:
                status, text = self._get(url, self._timeout_s)
            except Exception as ex:  # timeout / connection error: retry
                last_err = f"{type(ex).__name__}: {ex}"
            else:
                if status == 200:
                    return text
                if status in self.RETRYABLE_STATUS:
                    last_err = f"HTTP {status}"
                else:  # permanent client error — retrying cannot help
                    raise TransportError(f"HTTP {status} for {url}")
            if attempt < self._max_attempts:
                self._sleep(
                    self._interval_s * self._backoff_rate ** (attempt - 1)
                )
        raise TransportError(
            f"{url}: {last_err} after {self._max_attempts} attempts"
        )


def http_transport_factory(
    rate_limits: dict[str, float] | None = None, **kwargs
) -> Callable[[], HttpTransport]:
    """TransportFactory for etl.collect.fetch_pending: builds ONE
    HttpTransport (session + bucket) per partition. kwargs pass through to
    HttpTransport."""

    def factory() -> HttpTransport:
        return HttpTransport(rate_limits=rate_limits, **kwargs)

    return factory


def rate_limits_from_config(config: dict) -> dict[str, float]:
    """Derive {host: min_interval_seconds} from the reference-shaped
    config (config.json: website.*.url + scrape_interval). Sites without
    a scrape_interval get no per-host limit."""
    out: dict[str, float] = {}
    for site in (config.get("website") or {}).values():
        url, interval = site.get("url"), site.get("scrape_interval")
        if url and interval:
            out[_host_of(url)] = float(interval)
    return out
