"""REST service over a REAL socket — the stdlib ``http.server`` layer on
top of the ``ConversionService`` facade, closing the gap between the
contract-conformant function surface (`service.py`) and the reference's
live HTTP endpoint.

Reference parity: xtable-service ConversionResource.java:1-100 (JAX-RS
``POST /v1/conversion/table``) + the formal OpenAPI contract
``spec/rest-service-open-api.yaml``. This serves the contract's whole
path surface:

  - ``POST /v1/conversion/table``          -> 200 ConvertTableResponse
  - ``POST`` with ``Prefer: respond-async`` -> 202 SubmittedConversionResponse
    {"conversion-id": ...} and the conversion runs on a worker thread
  - ``GET /v1/conversion/table/{id}``      -> 202 while processing,
    200 ConvertTableResponse when done, ErrorModel on failure
  - everything else -> ErrorModel {message, type, code} with the
    matching HTTP status (the spec's ``default`` response)

The env ships no web framework; ``ThreadingHTTPServer`` is stdlib and
enough — the service is a control-plane endpoint (one conversion sync
per request), not a data-plane hot path, so Python-level HTTP handling
costs nothing that matters. Request JSON is validated against the
spec's required ConvertTableRequest fields before any Spark work runs.
"""

from __future__ import annotations

import json
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Optional

from pyspark.sql import SparkSession

from incubator_xtable_spark.service import ConversionService

_COLLECTION_PATH = "/v1/conversion/table"
# ConvertTableRequest required fields (rest-service-open-api.yaml)
_REQUIRED_FIELDS = (
    "source-format",
    "source-table-name",
    "source-table-path",
    "target-formats",
)


def _error_model(message: str, etype: str, code: int) -> dict[str, Any]:
    """The spec's ErrorModel: message/type/code are all required."""
    return {"message": message, "type": etype, "code": code}


class ConversionHttpServer:
    """Lifecycle wrapper: ``with ConversionHttpServer(spark) as srv:``
    binds a real TCP socket (port 0 => ephemeral, read ``srv.port``),
    serves on a daemon thread, and shuts down cleanly on exit."""

    def __init__(
        self, spark: SparkSession, host: str = "127.0.0.1", port: int = 0
    ) -> None:
        self.service = ConversionService(spark)
        self._jobs: dict[str, dict[str, Any]] = {}
        self._lock = threading.Lock()
        outer = self

        class _Handler(BaseHTTPRequestHandler):
            # one conversion per request: no keep-alive complexity needed
            protocol_version = "HTTP/1.1"

            def log_message(self, fmt: str, *args: Any) -> None:  # quiet
                pass

            def _send_json(self, code: int, payload: Optional[dict]) -> None:
                body = b"" if payload is None else json.dumps(payload).encode("utf-8")
                self.send_response(code)
                if body:
                    self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                if body:
                    self.wfile.write(body)

            def do_POST(self) -> None:  # noqa: N802 (http.server contract)
                # drain the body FIRST: answering before reading it would
                # desync a keep-alive connection (the unread bytes would
                # parse as the next request's start line)
                try:
                    length = int(self.headers.get("Content-Length", "0"))
                    raw = self.rfile.read(length)
                except ValueError as exc:
                    self._send_json(
                        400, _error_model(f"bad Content-Length: {exc}", "BadRequest", 400)
                    )
                    return
                if self.path.rstrip("/") != _COLLECTION_PATH:
                    self._send_json(
                        404, _error_model(f"no such path: {self.path}", "NotFound", 404)
                    )
                    return
                try:
                    request = json.loads(raw or b"")
                except (ValueError, json.JSONDecodeError) as exc:
                    self._send_json(
                        400, _error_model(f"invalid JSON body: {exc}", "BadRequest", 400)
                    )
                    return
                if not isinstance(request, dict):
                    self._send_json(
                        400, _error_model("request body must be an object", "BadRequest", 400)
                    )
                    return
                missing = [f for f in _REQUIRED_FIELDS if f not in request]
                if missing:
                    self._send_json(
                        400,
                        _error_model(
                            f"missing required fields: {missing}", "BadRequest", 400
                        ),
                    )
                    return
                if "respond-async" in (self.headers.get("Prefer") or ""):
                    cid = outer._submit_async(request)
                    self._send_json(202, {"conversion-id": cid})
                    return
                try:
                    self._send_json(200, outer.service.convert_table(request))
                except Exception as exc:  # noqa: BLE001 — ErrorModel surface
                    self._send_json(
                        500, _error_model(str(exc), type(exc).__name__, 500)
                    )

            def do_GET(self) -> None:  # noqa: N802
                prefix = _COLLECTION_PATH + "/"
                if not self.path.startswith(prefix):
                    self._send_json(
                        404, _error_model(f"no such path: {self.path}", "NotFound", 404)
                    )
                    return
                cid = self.path[len(prefix) :]
                with outer._lock:
                    job = outer._jobs.get(cid)
                if job is None:
                    self._send_json(
                        404, _error_model(f"unknown conversion-id: {cid}", "NotFound", 404)
                    )
                    return
                if not job["done"]:
                    self._send_json(202, None)  # spec: still processing, no body
                    return
                if job["error"] is not None:
                    self._send_json(500, job["error"])
                    return
                self._send_json(200, job["response"])

        self.httpd = ThreadingHTTPServer((host, port), _Handler)
        self.host, self.port = self.httpd.server_address[:2]
        self._thread: Optional[threading.Thread] = None

    def _submit_async(self, request: dict[str, Any]) -> str:
        cid = uuid.uuid4().hex
        with self._lock:
            self._jobs[cid] = {"done": False, "response": None, "error": None}

        def _run() -> None:
            try:
                resp = self.service.convert_table(request)
                err = None
            except Exception as exc:  # noqa: BLE001
                resp, err = None, _error_model(str(exc), type(exc).__name__, 500)
            with self._lock:
                self._jobs[cid].update(done=True, response=resp, error=err)

        threading.Thread(target=_run, daemon=True).start()
        return cid

    def start(self) -> "ConversionHttpServer":
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=10)

    def __enter__(self) -> "ConversionHttpServer":
        return self.start()

    def __exit__(self, *exc: Any) -> None:
        self.stop()


def serve(spark: SparkSession, host: str = "127.0.0.1", port: int = 8080) -> None:
    """Blocking entry point for the ``run_sync serve`` subcommand."""
    server = ConversionHttpServer(spark, host=host, port=port)
    print(json.dumps({"serving": f"http://{server.host}:{server.port}{_COLLECTION_PATH}"}))
    try:
        server.httpd.serve_forever()
    except KeyboardInterrupt:
        server.stop()
