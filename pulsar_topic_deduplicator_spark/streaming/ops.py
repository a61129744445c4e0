"""Operational scaffolding analogs: health signal, telemetry counters,
graceful shutdown (reference ops #13–#15).

| reference | here |
|---|---|
| ``/healthz`` HTTP endpoint, 204/500 (``src/healthCheck.ts:5-32``) | ``health_status(query)`` from ``StreamingQuery.isActive``/``status`` — wire to any HTTP thread |
| 60 s forwarded/dropped counters (``src/deduplication.ts:80-95``) | ``observe("dedup", ...)`` metrics read from query progress |
| ordered teardown: close consumer → flush producer → close (``src/index.ts:18-101``) | ``graceful_stop``: stop() (final micro-batch commits the sink — the flush) + awaitTermination |
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQuery


def health_status(query: StreamingQuery | None) -> tuple[int, str]:
    """(http_status, body) for a liveness probe: 204 healthy / 500 not —
    the reference's exact status mapping (``src/healthCheck.ts:12-24``)."""
    if query is not None and query.isActive:
        return 204, ""
    return 500, "streaming query not active"


def observed_counters(query: StreamingQuery, name: str = "dedup") -> dict:
    """observe() metrics summed over recent progress events.

    The reference logs-and-resets its counters every 60 s
    (``src/deduplication.ts:80-95``) — each micro-batch progress event is
    exactly such an interval counter, so the per-interval values are summed
    here (empty trailing batches contribute zero)."""
    totals: dict = {}
    for progress in query.recentProgress:
        metrics = progress.get("observedMetrics", {}).get(name)
        if metrics is None:
            continue
        d = metrics.asDict() if hasattr(metrics, "asDict") else dict(metrics)
        for k, v in d.items():
            if isinstance(v, (int, float)):
                totals[k] = totals.get(k, 0) + v
    return totals


def graceful_stop(query: StreamingQuery, timeout_seconds: float = 60.0) -> bool:
    """Ordered teardown: request stop, then wait for termination. The final
    micro-batch commit plays the reference's producer-flush role
    (``src/index.ts:60-71``); returns True when the query terminated inside
    the timeout."""
    query.stop()
    try:
        return query.awaitTermination(timeout_seconds)
    except Exception:
        return False


def serve_health(health_fn, port: int = 0):
    """A real listening ``/healthz`` endpoint — the reference runs an HTTP
    health server for its liveness probe (``src/healthCheck.ts:5-32``);
    this is the same thing on a stdlib daemon thread: GET /healthz returns
    whatever ``health_fn()`` maps to (204 healthy / 500 not), anything
    else 404. Returns ``(server, bound_port)``; call ``server.shutdown()``
    in teardown. Zero Spark involvement by design — the probe must answer
    even while the driver is busy."""
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    class _Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (stdlib handler casing)
            if self.path != "/healthz":
                self.send_response(404)
                self.end_headers()
                return
            status, body = health_fn()
            self.send_response(status)
            payload = body.encode()
            if payload:
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)
            else:
                self.end_headers()

        def log_message(self, *args):  # keep the probe out of stdout
            pass

    server = HTTPServer(("127.0.0.1", port), _Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server, server.server_address[1]


#: log-level → cloud-logging severity, the reference's pino bridge table
#: (``src/gcpLogging.ts:37-117``: trace/debug/info/warn/error/fatal →
#: DEBUG/DEBUG/INFO/WARNING/ERROR/CRITICAL). Exposed so a log4j/structured
#: logging config can reuse the exact mapping; ``structured_log_record``
#: is the one-line formatter analog.
SEVERITY_BY_LEVEL = {
    "trace": "DEBUG",
    "debug": "DEBUG",
    "info": "INFO",
    "warn": "WARNING",
    "warning": "WARNING",
    "error": "ERROR",
    "fatal": "CRITICAL",
}


def structured_log_record(level: str, message: str, **fields) -> dict:
    """One structured log record with the bridged severity — the shape the
    reference emits per line (severity + message + context fields)."""
    return {
        "severity": SEVERITY_BY_LEVEL.get(level.lower(), "DEFAULT"),
        "message": message,
        **fields,
    }
