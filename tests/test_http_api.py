"""HTTP delivery edge: the stdlib dev server must mirror the reference's
Flask surface — JSON table reads, rename-resilient column projection with
NO MATCH/AMBIGUOUS outcomes as HTTP statuses, time travel via query params,
metadata tables, and DDL routes — all over a real socket."""

from __future__ import annotations

import json
import urllib.request

import pytest
from pyspark.sql import functions as F

from thesis_iceberg_spark.http_api import Api, serve
from thesis_iceberg_spark.tablefmt.catalog import Catalog


@pytest.fixture(scope="module")
def api_base(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh"))
    cat = Catalog(spark, wh)
    df = spark.createDataFrame(
        [(1, "Sarah", 34), (2, "Mohammed", 29), (3, "Li", 41)],
        "idx INT, `First Name` STRING, age INT",
    )
    cat.create_table("people", df=df, now_ms=1_000)
    server, _thread = serve(Api(cat))
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield base
    server.shutdown()


def _get(base, path):
    req = urllib.request.Request(base + path)
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _patch(base, path):
    req = urllib.request.Request(base + path, method="PATCH")
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_list_and_scan(api_base):
    assert _get(api_base, "/tables") == (200, {"tables": ["people"]})
    status, rows = _get(api_base, "/people")
    assert status == 200 and len(rows) == 3
    status, rows = _get(api_base, "/people?where=age%20%3E%2030&limit=10")
    assert status == 200
    assert sorted(r["idx"] for r in rows) == [1, 3]


def test_metadata_tables(api_base):
    status, snaps = _get(api_base, "/people/snapshots")
    assert status == 200 and snaps[0]["operation"] == "append"
    status, refs = _get(api_base, "/people/refs")
    assert status == 200 and refs[0]["name"] == "main"


def test_column_resolution_and_ddl(api_base):
    # quoted/spaced column name via URL encoding
    status, body = _get(api_base, "/people/column/First%20Name")
    assert status == 200 and body["resolved_to"] == "First Name"
    # rename, then the OLD name must still resolve (field-id history)
    status, body = _patch(api_base, "/people/rename_column/First%20Name/Full%20Name")
    assert status == 200
    status, body = _get(api_base, "/people/column/First%20Name")
    assert status == 200 and body["resolved_to"] == "Full Name"
    assert {r["Full Name"] for r in body["rows"]} == {"Sarah", "Mohammed", "Li"}
    # nonexistent column -> 404 NO MATCH (ref: api.py:410-413)
    status, body = _get(api_base, "/people/column/salary_xyzzy")
    assert status == 404 and "NO MATCH" in body["error"]
    # add_column route
    status, body = _patch(api_base, "/people/add_column/note/string")
    assert status == 200 and body["added"] == "note"


def test_time_travel_param(api_base, spark):
    # append a row, then version 1 must still show 3 rows
    status, rows = _get(api_base, "/people?version=1")
    assert status == 200 and len(rows) == 3
    status, body = _get(api_base, "/people?version=999")
    assert status == 404


def test_unknown_routes(api_base):
    assert _get(api_base, "/nope")[0] == 404
    assert _get(api_base, "/people/bogus_meta")[0] == 404


def test_bad_requests_get_http_errors_not_dropped_connections(api_base):
    status, body = _get(api_base, "/people?limit=abc")
    assert status == 400 and "error" in body
    status, body = _get(api_base, "/people?where=definitely%20not((sql")
    assert status == 500 and "error" in body
