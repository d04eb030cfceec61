"""REST service end-to-end over every route — analog of the reference's
app/tests/test_client.py (FastAPI TestClient → direct dispatcher + one
real-socket smoke test)."""

import http.client
import json
import threading

import numpy as np
import pytest

from alayalite_tpu.service.app import ServiceApp, create_app


@pytest.fixture()
def app(tmp_path):
    return create_app(str(tmp_path))


def _items(n, dim=8, seed=0):
    rng = np.random.default_rng(seed)
    emb = rng.normal(size=(n, dim)).astype(np.float32)
    return [[i, f"doc {i}", emb[i].tolist(), {"even": i % 2 == 0}]
            for i in range(n)], emb


def test_create_conflict_and_list(app):
    s, body = app.handle("POST", "/api/v1/collection/create",
                         {"collection_name": "c"})
    assert s == 200
    s, body = app.handle("POST", "/api/v1/collection/create",
                         {"collection_name": "c"})
    assert s == 409
    s, body = app.handle("POST", "/api/v1/collection/list", {})
    assert s == 200 and body == ["c"]


def test_insert_query_upsert_delete_cycle(app):
    app.handle("POST", "/api/v1/collection/create", {"collection_name": "c"})
    items, emb = _items(32)
    s, body = app.handle("POST", "/api/v1/collection/insert",
                         {"collection_name": "c", "items": items})
    assert s == 200, body
    s, res = app.handle("POST", "/api/v1/collection/query", {
        "collection_name": "c", "query_vector": emb[:2].tolist(),
        "limit": 3, "ef_search": 10})
    assert s == 200
    assert res["id"][0][0] == 0 and res["id"][1][0] == 1
    assert len(res["distance"][0]) == 3

    s, _ = app.handle("POST", "/api/v1/collection/upsert", {
        "collection_name": "c",
        "items": [[0, "updated", np.full(8, 5.0).tolist(), {}]]})
    assert s == 200
    s, res = app.handle("POST", "/api/v1/collection/query", {
        "collection_name": "c",
        "query_vector": [np.full(8, 5.0).tolist()], "limit": 1,
        "ef_search": 10})
    assert res["document"][0][0] == "updated"

    s, _ = app.handle("POST", "/api/v1/collection/delete_by_id",
                      {"collection_name": "c", "ids": [0]})
    assert s == 200
    s, _ = app.handle("POST", "/api/v1/collection/delete_by_filter",
                      {"collection_name": "c", "filter": {"even": True}})
    assert s == 200


def test_missing_collection_404(app):
    for route, extra in [
        ("insert", {"items": []}),
        ("query", {"query_vector": [[0.0]], "limit": 1}),
        ("upsert", {"items": []}),
        ("delete_by_id", {"ids": [1]}),
        ("delete_by_filter", {"filter": {}}),
        ("set_metric", {"metric": "l2"}),
    ]:
        s, body = app.handle("POST", f"/api/v1/collection/{route}",
                             {"collection_name": "nope", **extra})
        assert s == 404, (route, s, body)
    s, _ = app.handle("POST", "/api/v1/collection/save",
                      {"collection_name": "nope"})
    assert s == 404


def test_save_and_reload(tmp_path):
    app = create_app(str(tmp_path))
    app.handle("POST", "/api/v1/collection/create", {"collection_name": "c"})
    items, emb = _items(16)
    app.handle("POST", "/api/v1/collection/insert",
               {"collection_name": "c", "items": items})
    s, _ = app.handle("POST", "/api/v1/collection/save",
                      {"collection_name": "c"})
    assert s == 200
    app2 = create_app(str(tmp_path))
    s, res = app2.handle("POST", "/api/v1/collection/query", {
        "collection_name": "c", "query_vector": emb[:1].tolist(),
        "limit": 1, "ef_search": 10})
    assert s == 200 and res["id"][0][0] == 0


def test_reset_and_delete(app):
    app.handle("POST", "/api/v1/collection/create", {"collection_name": "a"})
    s, _ = app.handle("POST", "/api/v1/collection/delete",
                      {"collection_name": "a"})
    assert s == 200
    s, _ = app.handle("POST", "/api/v1/collection/delete",
                      {"collection_name": "a"})
    assert s == 404
    app.handle("POST", "/api/v1/collection/create", {"collection_name": "b"})
    s, _ = app.handle("POST", "/api/v1/collection/reset", {})
    assert s == 200
    s, names = app.handle("POST", "/api/v1/collection/list", {})
    assert names == []


def test_unknown_route_and_method(app):
    s, _ = app.handle("POST", "/api/v1/collection/nope", {})
    assert s == 404
    s, _ = app.handle("GET", "/api/v1/collection/list", {})
    assert s == 405


def test_http_socket_roundtrip(tmp_path):
    """One real-socket pass through the stdlib server."""
    from http.server import ThreadingHTTPServer
    import alayalite_tpu.service.app as appmod

    app = create_app(str(tmp_path))

    class H(appmod.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0) or 0)
            body = json.loads(self.rfile.read(n)) if n else {}
            status, payload = app.handle("POST", self.path, body)
            data = json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", srv.server_address[1])
        conn.request("POST", "/api/v1/collection/create",
                     json.dumps({"collection_name": "c"}),
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200
        assert b"created successfully" in resp.read()
    finally:
        srv.shutdown()


def test_batched_serving_mode(tmp_path, monkeypatch):
    """ALAYALITE_BATCH_SERVING=1: concurrent queries coalesce through the
    native queue and results match the direct path."""
    from alayalite_tpu.native import get_lib

    if get_lib() is None:
        pytest.skip("native toolchain unavailable")
    monkeypatch.setenv("ALAYALITE_BATCH_SERVING", "1")
    app = create_app(str(tmp_path))
    app.handle("POST", "/api/v1/collection/create", {"collection_name": "c"})
    items, emb = _items(48)
    app.handle("POST", "/api/v1/collection/insert",
               {"collection_name": "c", "items": items})

    results = {}

    def worker(lo, hi):
        for i in range(lo, hi):
            s, res = app.handle("POST", "/api/v1/collection/query", {
                "collection_name": "c", "query_vector": [emb[i].tolist()],
                "limit": 1, "ef_search": 10})
            results[i] = (s, res["id"][0][0] if s == 200 else None)

    ts = [threading.Thread(target=worker, args=(t * 8, t * 8 + 8))
          for t in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert all(results[i] == (200, i) for i in range(32)), results


def test_batched_serving_ef_upgrade_and_bad_dim(tmp_path, monkeypatch):
    """A later request with larger ef_search must rebuild the cached server
    (not silently run at the first request's ef), and a wrong-dimension
    query must be rejected with 400, never reach the native queue."""
    from alayalite_tpu.native import get_lib

    if get_lib() is None:
        pytest.skip("native toolchain unavailable")
    monkeypatch.setenv("ALAYALITE_BATCH_SERVING", "1")
    app = create_app(str(tmp_path))
    app.handle("POST", "/api/v1/collection/create", {"collection_name": "c"})
    items, emb = _items(48)
    app.handle("POST", "/api/v1/collection/insert",
               {"collection_name": "c", "items": items})

    s, _ = app.handle("POST", "/api/v1/collection/query", {
        "collection_name": "c", "query_vector": [emb[0].tolist()],
        "limit": 1, "ef_search": 10})
    assert s == 200
    srv1 = app._servers["c"]
    assert srv1.ef == 10

    s, _ = app.handle("POST", "/api/v1/collection/query", {
        "collection_name": "c", "query_vector": [emb[0].tolist()],
        "limit": 1, "ef_search": 40})
    assert s == 200
    srv2 = app._servers["c"]
    assert srv2 is not srv1 and srv2.ef >= 40

    # wrong dimension: 400, and the server cache is untouched
    s, body = app.handle("POST", "/api/v1/collection/query", {
        "collection_name": "c", "query_vector": [[1.0, 2.0]],
        "limit": 1, "ef_search": 40})
    assert s == 400 and "dimension" in str(body)
    assert app._servers["c"] is srv2
