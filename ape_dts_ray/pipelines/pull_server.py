"""Consumer-pull HTTP pipeline — the HttpServerPipeline analog.

Reference semantics (dt-pipeline/src/http_server_pipeline.rs:30-120): instead
of sinking, the task exposes ``/fetch_new?batch_size``, ``/fetch_old``,
``/ack?offset`` and ``/info``; consumers pull Avro-encoded batches and
advance the committed offset by acking, which is the only thing that moves
the checkpoint. Here the source is an offset-ordered change-event Parquet
log and the payload is this engine's Avro single-object encoding
(stages/avro.py) framed as 4-byte big-endian length-prefixed records.

Pull state machine (mirrors the reference's two-cursor model):
- ``acked``   — highest offset the consumer has committed (persisted).
- in-flight  — the one outstanding unacked batch; ``/fetch_new`` serves the
  NEXT batch only when nothing is in flight, ``/fetch_old`` re-serves the
  in-flight batch (crash-recovery for the consumer), ``/ack`` with the
  batch's max offset retires it.

The server is a localhost control surface (stdlib ThreadingHTTPServer), not
a data-plane component — batches stream from Parquet with row-group-pruned
reads; nothing is held in memory beyond the in-flight batch.
"""

from __future__ import annotations

import json
import os
import struct
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pyarrow.dataset as pads
import pyarrow.parquet as pq

from ape_dts_ray.meta import COL_OFFSET
from ape_dts_ray.stages.avro import avro_encode
from ape_dts_ray.state.manifest import atomic_write_text


def frame_records(values: list[bytes]) -> bytes:
    return b"".join(struct.pack(">I", len(v)) + v for v in values)


def unframe_records(data: bytes) -> list[bytes]:
    out, pos = [], 0
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        out.append(data[pos + 4:pos + 4 + ln])
        pos += 4 + ln
    return out


class PullServer:
    """Serve an offset-ordered change-event Parquet log for consumer pull."""

    def __init__(self, events_path: str, state_path: str,
                 host: str = "127.0.0.1", port: int = 0,
                 key_cols: tuple[str, ...] = ("conv_id", "turn_idx")):
        self.events_path = events_path
        self.state_path = state_path
        self.key_cols = tuple(key_cols)    # Avro envelope key columns
        self.acked = -1
        if os.path.exists(state_path):
            with open(state_path) as f:
                self.acked = json.load(f)["acked"]
        f = pq.ParquetFile(events_path)
        ci = f.schema_arrow.get_field_index(COL_OFFSET)
        mx, complete = -1, True
        for rg in range(f.metadata.num_row_groups):
            st = f.metadata.row_group(rg).column(ci).statistics
            if st is None or st.max is None:
                complete = False
                break
            mx = max(mx, st.max)
        if not complete:
            # stats-less writer: fall back to a one-column scan — with
            # max_offset stuck at -1 fetch_new's widening loop would break
            # on its first empty span and silently drop the sparse tail
            import pyarrow.compute as _pc
            t = pq.read_table(events_path, columns=[COL_OFFSET])
            mx = _pc.max(t.column(COL_OFFSET)).as_py() if t.num_rows else -1
            mx = -1 if mx is None else int(mx)
        self.max_offset = mx
        self.inflight: bytes | None = None
        self.inflight_hi = -1
        self.lock = threading.Lock()
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):   # quiet
                pass

            def _send(self, code: int, body: bytes,
                      ctype: str = "application/octet-stream"):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                u = urlparse(self.path)
                q = {k: v[0] for k, v in parse_qs(u.query).items()}
                try:
                    if u.path == "/info":
                        self._send(200, json.dumps(server.info()).encode(),
                                   "application/json")
                    elif u.path == "/fetch_new":
                        try:
                            bs = int(q.get("batch_size", "1000"))
                        except ValueError:
                            self._send(400, b"batch_size must be an integer")
                            return
                        self._send(200, server.fetch_new(bs))
                    elif u.path == "/fetch_old":
                        self._send(200, server.fetch_old())
                    elif u.path == "/ack":
                        if "offset" not in q:
                            # a KeyError would escape the handler and close
                            # the connection with NO status line — the
                            # client couldn't tell a crash from a bad call
                            self._send(400, b"ack requires ?offset=<int>")
                            return
                        try:
                            off = int(q["offset"])
                        except ValueError:
                            self._send(400, b"offset must be an integer")
                            return
                        server.ack(off)
                        self._send(200, b"{}", "application/json")
                    else:
                        self._send(404, b"not found")
                except ValueError as e:
                    # protocol-state refusals (unacked batch, wrong ack)
                    self._send(409, str(e).encode())

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self.thread = threading.Thread(target=self.httpd.serve_forever,
                                       daemon=True)

    # ---------- pull protocol ----------
    def info(self) -> dict:
        with self.lock:
            return {"acked": self.acked, "max_offset": self.max_offset,
                    "inflight_hi": self.inflight_hi}

    def fetch_new(self, batch_size: int) -> bytes:
        with self.lock:
            if self.inflight is not None:
                raise ValueError("unacked batch in flight — /fetch_old or /ack")
            lo = self.acked + 1
            # bounded read: filter to a widening offset range instead of
            # materializing + sorting the whole un-acked tail per fetch
            # (a fresh consumer against a multi-GB log would OOM). Offsets
            # may be sparse, so double the span until rows appear or the
            # log end is passed.
            span = max(batch_size, 1)
            t = None
            while True:
                hi = lo + span - 1
                t = pq.read_table(
                    self.events_path,
                    filters=[(COL_OFFSET, ">=", lo),
                             (COL_OFFSET, "<=", hi)]).sort_by(COL_OFFSET)
                if t.num_rows >= batch_size or hi >= self.max_offset:
                    break
                span *= 2
            t = t.slice(0, batch_size)
            if t.num_rows == 0:
                return b""
            env = avro_encode(t, key_cols=self.key_cols)
            body = frame_records(env.column("value").to_pylist())
            self.inflight = body
            self.inflight_hi = int(
                t.column(COL_OFFSET)[t.num_rows - 1].as_py())
            return body

    def fetch_old(self) -> bytes:
        with self.lock:
            return self.inflight or b""

    def ack(self, offset: int) -> None:
        with self.lock:
            if self.inflight is None or offset != self.inflight_hi:
                raise ValueError(
                    f"ack {offset} does not match in-flight hi "
                    f"{self.inflight_hi}")
            self.acked = offset
            atomic_write_text(self.state_path,
                              json.dumps({"acked": self.acked}))
            self.inflight = None
            self.inflight_hi = -1

    # ---------- lifecycle ----------
    def start(self) -> "PullServer":
        self.thread.start()
        return self

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
