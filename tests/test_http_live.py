"""Live-wire integration test: HttpBackend over RequestsTransport against
an in-process ``http.server`` thread — no mocks on the wire format.

The mock-transport suite (test_http_backend.py) proves the retry logic
against a faked Transport seam, exactly as the reference mocks
requests.post/get (/root/reference/tests/test_sdk.py:30-45,258-306).
This module closes the remaining gap: real request/response encoding
through the actual ``requests`` package — JSON bodies on POST, the
Authorization header on the wire, 524 retry-on-GET with backoff, and
submit-never-retried, all observed server-side.

Skipped automatically where ``requests`` isn't installed (the transport
import is gated on it).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

pytest.importorskip("requests")

from sutro_spark.operators.backends import (  # noqa: E402
    HttpBackend,
    HttpStatusError,
    RequestsTransport,
)


class _Api(BaseHTTPRequestHandler):
    """Minimal sutro-shaped API. Class-level knobs are reset per test via
    the ``server`` fixture. Records every request (method, path, headers,
    body) so assertions run against what actually crossed the wire."""

    log: list[dict]
    status_524s_remaining: int
    submit_524: bool

    def _send(self, code: int, body: dict | None = None) -> None:
        payload = json.dumps(body or {}).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def _record(self) -> dict:
        n = int(self.headers.get("Content-Length") or 0)
        raw = self.rfile.read(n) if n else b""
        entry = {
            "method": self.command,
            "path": self.path,
            "auth": self.headers.get("Authorization"),
            "body": json.loads(raw) if raw else None,
        }
        type(self).log.append(entry)
        return entry

    def do_POST(self) -> None:  # noqa: N802 - http.server API
        entry = self._record()
        if self.path == "/batch-inference":
            if type(self).submit_524:
                self._send(524)
                return
            self._send(200, {"results": "job-live-1"})
        elif self.path == "/job-results":
            inputs = [
                e["body"]["inputs"]
                for e in type(self).log
                if e["path"] == "/batch-inference"
            ][-1]
            self._send(
                200,
                {
                    "results": {
                        "outputs": [s.upper() for s in inputs],
                        "cumulative_logprobs": [-1.0] * len(inputs),
                    }
                },
            )
        else:
            self._send(404)

    def do_GET(self) -> None:  # noqa: N802 - http.server API
        self._record()
        if self.path.startswith("/job-status/"):
            if type(self).status_524s_remaining > 0:
                type(self).status_524s_remaining -= 1
                self._send(524)
                return
            self._send(200, {"results": "SUCCEEDED"})
        else:
            self._send(404)

    def log_message(self, *args) -> None:  # silence per-request stderr
        pass


@pytest.fixture()
def server():
    _Api.log = []
    _Api.status_524s_remaining = 0
    _Api.submit_524 = False
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _Api)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{httpd.server_address[1]}", _Api
    finally:
        httpd.shutdown()
        httpd.server_close()


def _backend(base_url: str) -> tuple[HttpBackend, list[float]]:
    sleeps: list[float] = []
    be = HttpBackend(
        base_url,
        api_key="live-key",
        transport=RequestsTransport(timeout=10.0),
        sleep=sleeps.append,
        poll_interval=0.0,
    )
    return be, sleeps


def test_end_to_end_generate_over_real_wire(server):
    base_url, api = server
    import pandas as pd

    be, _ = _backend(base_url)
    out = be.generate(pd.Series(["alpha", "beta"]), model="m1")
    assert out["outputs"].tolist() == ["ALPHA", "BETA"]
    assert out["cumulative_logprobs"].tolist() == [-1.0, -1.0]
    # wire assertions: auth header and the reference payload shape
    # actually crossed the socket
    submit = next(e for e in api.log if e["path"] == "/batch-inference")
    assert submit["auth"] == "Key live-key"
    assert submit["body"]["model"] == "m1"
    assert submit["body"]["inputs"] == ["alpha", "beta"]
    assert set(submit["body"]) >= {
        "model", "inputs", "job_priority", "json_schema", "system_prompt",
        "cost_estimate", "sampling_params", "random_seed_per_input",
        "truncate_rows", "name", "description",
    }


def test_524_on_status_is_retried_with_backoff(server):
    base_url, api = server
    api.status_524s_remaining = 3
    be, sleeps = _backend(base_url)
    job_id = be.submit(be.build_payload(["x"], model="m"))
    assert be.poll_until_done(job_id) == "SUCCEEDED"
    gets = [e for e in api.log if e["method"] == "GET"]
    assert len(gets) == 4  # 3 × 524 + final 200, all server-observed
    assert sleeps[:3] == [1, 2, 4]  # exponential backoff between retries


def test_submit_is_never_retried_on_524(server):
    base_url, api = server
    api.submit_524 = True
    be, _ = _backend(base_url)
    with pytest.raises(HttpStatusError) as err:
        be.submit(be.build_payload(["x"], model="m"))
    assert err.value.status_code == 524
    submits = [e for e in api.log if e["path"] == "/batch-inference"]
    assert len(submits) == 1  # exactly ONE attempt hit the server
