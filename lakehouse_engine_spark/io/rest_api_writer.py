"""REST API sink — POST/PUT DataFrame rows to an HTTP endpoint.

Reference parity: ``io/writers/rest_api_writer.py:35-210``. Each row (or
chunk of rows) becomes one HTTP request; the payload is either a
pre-serialized JSON column (``rest_api_payload_col``) or the whole row as a
JSON object, optionally wrapped with static extra fields.

Spark-first notes: requests are issued executor-side via
``foreachPartition`` — one HTTP session per partition, no driver collect —
so throughput scales with the cluster, and a ``rest_api_chunk_size`` > 1
batches rows into JSON-array payloads to amortize round-trips (the
reference's chunked mode). Success/failure counts come back through a Spark
accumulator rather than a driver-side loop.
"""

from __future__ import annotations

import json
from typing import Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_rest_api(df: DataFrame, options: dict) -> None:
    """Send ``df`` to the configured endpoint.

    Options (reference ``io/writers/rest_api_writer.py:60-118``):

    - ``rest_api_url`` (required), ``rest_api_method`` (``post``/``put``),
      ``rest_api_header`` (dict), ``rest_api_basic_auth`` (``{username,
      password}``), ``rest_api_timeout`` (sec, default 30),
      ``rest_api_payload_col`` (column holding serialized JSON),
      ``rest_api_chunk_size`` (rows per request, default 1),
      ``rest_api_extra_json_payload`` (static dict merged into each payload),
      ``rest_api_fail_on_error`` (default True).
    """
    url: Optional[str] = options.get("rest_api_url") or options.get("url")
    if not url:
        raise ValueError("rest_api writer: rest_api_url is required")
    method = str(options.get("rest_api_method", "post")).lower()
    headers = options.get("rest_api_header") or {"Content-Type": "application/json"}
    auth_conf = options.get("rest_api_basic_auth")
    # the reference's writers fixtures also pass the flat form
    # (rest_api_basic_auth_username / rest_api_basic_auth_password)
    if not auth_conf and options.get("rest_api_basic_auth_username"):
        auth_conf = {
            "username": options["rest_api_basic_auth_username"],
            "password": options.get("rest_api_basic_auth_password", ""),
        }
    timeout = float(options.get("rest_api_timeout", 30))
    payload_col = options.get("rest_api_payload_col")
    chunk_size = int(options.get("rest_api_chunk_size", 1))
    extra = options.get("rest_api_extra_json_payload") or {}
    fail_on_error = bool(options.get("rest_api_fail_on_error", True))

    if payload_col:
        payloads = df.select(F.col(payload_col).cast("string").alias("__payload"))
    else:
        payloads = df.select(F.to_json(F.struct(*df.columns)).alias("__payload"))

    failures = df.sparkSession.sparkContext.accumulator(0)

    def _send_partition(rows: Iterator) -> None:
        import requests  # executor-side import

        session = requests.Session()
        if auth_conf:
            session.auth = (auth_conf["username"], auth_conf["password"])
        send = getattr(session, method)

        def _post(body: str) -> None:
            resp = send(url, data=body.encode("utf-8"), headers=headers, timeout=timeout)
            if resp.status_code >= 400:
                failures.add(1)
                if fail_on_error:
                    raise RuntimeError(
                        f"rest_api writer: {method.upper()} {url} -> {resp.status_code}"
                    )

        chunk: list = []
        for row in rows:
            body = row["__payload"]
            if extra:
                merged = {**json.loads(body), **extra}
                body = json.dumps(merged)
            if chunk_size <= 1:
                _post(body)
            else:
                chunk.append(body)
                if len(chunk) >= chunk_size:
                    _post("[" + ",".join(chunk) + "]")
                    chunk = []
        if chunk:
            _post("[" + ",".join(chunk) + "]")

    payloads.foreachPartition(_send_partition)
    if failures.value and fail_on_error:
        raise RuntimeError(f"rest_api writer: {failures.value} failed requests")
