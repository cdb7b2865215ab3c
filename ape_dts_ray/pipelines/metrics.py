"""Scrapeable metrics endpoint — the prometheus_metrics/task_metrics analog.

The reference exposes record/byte counters and RT windows over HTTP for
Prometheus (dt-common/src/monitor/prometheus_metrics.rs,
task_metrics.rs:19-59 — counters are aggregated per task and scraped, not
pushed). This engine's durable equivalents already exist on disk: committed
epoch manifests carry per-(epoch, partition) event/row/upsert/delete counts
and offset ranges (state/lake.py::lineage_table), and the heartbeat file
carries liveness + watermark. ``MetricsServer`` serves both:

    /metrics        Prometheus text exposition (counters + gauges)
    /metrics.json   the same numbers as JSON

Counters are recomputed from the manifests on every scrape — the scrape
path reads small JSON files only, never data files, so it is safe to point
a scraper at a lake that is mid-replay (manifests are atomic; a scrape sees
a committed prefix). Compaction folds manifests away: the server detects
the raw-total reset and carries the pre-compaction totals forward, so
counters never regress (Prometheus counter contract).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from ape_dts_ray.state.lake import LakeTable

_COUNTERS = ("events", "rows", "upserts", "deletes")


def collect_metrics(lake: LakeTable) -> dict:
    """One sample of the lake's counters/gauges from manifests + heartbeat."""
    lin = lake.lineage_table()
    out = {f"{c}_total": 0 for c in _COUNTERS}
    if lin.num_rows:
        import pyarrow.compute as pc

        for c in _COUNTERS:
            out[f"{c}_total"] = int(pc.sum(lin.column(c)).as_py() or 0)
    out["committed_epochs"] = len(lake.committed_epochs())
    out["watermark"] = lake.watermark()
    out["schema_version"] = lake.schema_version
    hb = lake.heartbeat()
    out["heartbeat_time_unix"] = float(hb["time_unix"]) if hb else 0.0
    return out


def prometheus_text(sample: dict, table: str) -> str:
    """Prometheus text exposition format (the public scrape format)."""
    lines = []
    for c in _COUNTERS:
        name = f"ape_dts_ray_{c}_total"
        lines += [f"# TYPE {name} counter",
                  f'{name}{{table="{table}"}} {sample[f"{c}_total"]}']
    for g in ("committed_epochs", "watermark", "schema_version",
              "heartbeat_time_unix"):
        name = f"ape_dts_ray_{g}"
        lines += [f"# TYPE {name} gauge",
                  f'{name}{{table="{table}"}} {sample[g]}']
    return "\n".join(lines) + "\n"


class MetricsServer:
    """Localhost scrape endpoint over one lake (control surface, stdlib
    ThreadingHTTPServer — same pattern as pipelines/pull_server.py)."""

    def __init__(self, lake_root: str, host: str = "127.0.0.1", port: int = 0):
        self.lake_root = lake_root
        self._carry = {f"{c}_total": 0 for c in _COUNTERS}
        self._last_raw = {f"{c}_total": 0 for c in _COUNTERS}
        self._lock = threading.Lock()
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):     # quiet
                pass

            def do_GET(self):
                try:
                    sample, table = server.sample()
                except Exception as e:  # noqa: BLE001 — scrape must not 500-loop
                    body = f"# scrape error: {e!r}\n".encode()
                    self.send_response(503)
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                if self.path.startswith("/metrics.json"):
                    body = json.dumps(sample).encode()
                    ctype = "application/json"
                elif self.path.startswith("/metrics"):
                    body = prometheus_text(sample, table).encode()
                    ctype = "text/plain; version=0.0.4"
                else:
                    self.send_response(404)
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self.thread = threading.Thread(target=self.httpd.serve_forever,
                                       daemon=True)

    def sample(self) -> tuple[dict, str]:
        lake = LakeTable.open(self.lake_root)
        with self._lock:
            # collect INSIDE the lock: two overlapping scrapes applying raw
            # counters out of order would trip the reset heuristic (stale
            # 100 after fresh 120 → carry += 120) and inflate totals forever
            s = collect_metrics(lake)
            for k in self._carry:       # counter-reset handling: compaction
                raw = s[k]              # folds manifests away; carry the
                if raw < self._last_raw[k]:   # pre-reset total forward
                    self._carry[k] += self._last_raw[k]
                self._last_raw[k] = raw
                s[k] = raw + self._carry[k]
        return s, lake.meta.name

    def start(self) -> "MetricsServer":
        self.thread.start()
        return self

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
