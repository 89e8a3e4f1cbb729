"""REST API writer tests against an in-process HTTP server.

Models the reference's rest_api writer behavior
(``io/writers/rest_api_writer.py:35-210`` there): per-row and chunked JSON
payloads, payload-column mode, failure propagation.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from lakehouse_engine_spark import load_data


@pytest.fixture()
def http_sink():
    received: list = []
    status = {"code": 200}

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            received.append(json.loads(body))
            self.send_response(status["code"])
            self.end_headers()

        def log_message(self, *a):  # silence
            pass

    server = HTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield {
        "url": f"http://127.0.0.1:{server.server_port}/ingest",
        "received": received,
        "status": status,
    }
    server.shutdown()


def _acon(sf_dir, url, **opts):
    return {
        "input_specs": [
            {
                "spec_id": "nat",
                "data_format": "parquet",
                "location": f"{sf_dir}/nation.parquet",
            }
        ],
        "transform_specs": [
            {
                "spec_id": "t",
                "input_id": "nat",
                "transformers": [
                    {"function": "expression_filter", "args": {"exp": "n_nationkey < 5"}}
                ],
            }
        ],
        "output_specs": [
            {
                "spec_id": "o",
                "input_id": "t",
                "data_format": "rest_api",
                "options": {"rest_api_url": url, **opts},
            }
        ],
    }


def test_rest_api_row_per_request(spark, sf_dir, http_sink):
    load_data(_acon(sf_dir, http_sink["url"]))
    got = http_sink["received"]
    assert len(got) == 5
    assert {p["n_nationkey"] for p in got} == {0, 1, 2, 3, 4}


def test_rest_api_chunked_with_extra_payload(spark, sf_dir, http_sink):
    load_data(
        _acon(
            sf_dir,
            http_sink["url"],
            rest_api_chunk_size=10,
            rest_api_extra_json_payload={"source": "lhe"},
        )
    )
    got = http_sink["received"]
    rows = [r for chunk in got for r in (chunk if isinstance(chunk, list) else [chunk])]
    assert len(rows) == 5
    assert all(r["source"] == "lhe" for r in rows)


def test_rest_api_failure_raises(spark, sf_dir, http_sink):
    http_sink["status"]["code"] = 500
    with pytest.raises(Exception):
        load_data(_acon(sf_dir, http_sink["url"]))
