"""HTTP serving edge on the standard library (SURVEY §2.1 S10-S12).

The reference serves GTFS-RT over FastAPI+uvicorn (realtime.py:273-481);
neither package exists in this container, but the serving contract is
four GET endpoints returning rendered bytes — well within
``http.server``. Route paths, the ``?debug`` JSON switch, response cache
keys (``{path}-{format}``) and per-endpoint TTLs all follow the
reference (realtime.py:273-305, config.py:25-30).

The data side stays the engine's: every response renders from the lake's
current snapshot versions via ``serving.py`` plans, and the protobuf face
uses the vendored wire codec. At scale this edge runs as many stateless
replicas as needed — they share nothing but the lake manifest files.
"""

from __future__ import annotations

import datetime as dt
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from py_gtfs_duckdb_spark import serving
from py_gtfs_duckdb_spark.cache import make_response_cache
from py_gtfs_duckdb_spark.config import load_config
from py_gtfs_duckdb_spark.lake import GtfsLake

_PBF = "application/octet-stream"
_JSON = "application/json"


class RealtimeHttpServer:
    """Threaded HTTP server over the lake's realtime snapshot."""

    def __init__(
        self,
        lake: GtfsLake,
        config: dict | None = None,
        host: str = "127.0.0.1",
        port: int = 0,
    ):
        self.lake = lake
        self.cfg = config or load_config()
        self.host, self._port = host, port
        self.cache = (
            make_response_cache(self.cfg)
            if self.cfg["app"]["caching_enabled"]
            else None
        )
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # -- rendering -----------------------------------------------------------

    def _feed_response(self, kind: str, fmt: str) -> tuple[bytes, str]:
        build = {
            "alerts": serving.feed_message_alerts,
            "trip_updates": serving.feed_message_trip_updates,
            "vehicle_positions": serving.feed_message_vehicle_positions,
        }[kind]
        feed = build(self.lake)
        if fmt == "json":
            # reference debug face: indented JSON (realtime.py:293)
            return json.dumps(feed, indent=4).encode(), _JSON
        return serving.to_protobuf(feed), _PBF

    def render(self, path: str, query: dict) -> tuple[int, bytes, str]:
        """(status, body, content_type) for a request path — the testable
        core; the handler just shovels it onto the socket."""
        routing = self.cfg["app"]["routing"]
        fmt = "json" if "debug" in query else "pbf"
        ttls = self.cfg["caching"]
        feeds = {
            routing["service_alerts_endpoint"]: (
                "alerts",
                ttls["caching_service_alerts_ttl_seconds"],
            ),
            routing["trip_updates_endpoint"]: (
                "trip_updates",
                ttls["caching_trip_updates_ttl_seconds"],
            ),
            routing["vehicle_positions_endpoint"]: (
                "vehicle_positions",
                ttls["caching_vehicle_positions_ttl_seconds"],
            ),
        }
        if path in feeds:
            kind, ttl = feeds[path]

            def rend(kind=kind, fmt=fmt):
                return self._feed_response(kind, fmt)

            if self.cache is not None:
                body, ctype = self.cache.get_or_render(f"{path}-{fmt}", ttl, rend)
            else:
                body, ctype = rend()
            return 200, body, ctype
        if self.cfg["app"]["rss_enabled"] and path == routing["rss_endpoint"]:
            rss = serving.alerts_rss(self.lake, base_url=self.cfg["rss"]["base_url"])
            return 200, rss.encode(), "application/rss+xml"
        if self.cfg["app"]["monitor_enabled"] and path == routing["monitor_endpoint"]:
            html = serving.monitor_html(self.lake, dt.date.today())
            return 200, html.encode(), "text/html"
        return 404, b"not found", "text/plain"

    # -- lifecycle -----------------------------------------------------------

    def start(self) -> None:
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 - http.server API
                parsed = urlparse(self.path)
                try:
                    status, body, ctype = outer.render(
                        parsed.path, parse_qs(parsed.query, keep_blank_values=True)
                    )
                except Exception as exc:  # render error -> 500, keep serving
                    status, body, ctype = 500, repr(exc).encode(), "text/plain"
                self.send_response(status)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                if outer.cfg["app"]["cors_enabled"]:
                    self.send_header("Access-Control-Allow-Origin", "*")
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args):  # quiet
                pass

        self._httpd = ThreadingHTTPServer((self.host, self._port), Handler)
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()

    @property
    def port(self) -> int:
        assert self._httpd is not None, "server not started"
        return self._httpd.server_address[1]

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
