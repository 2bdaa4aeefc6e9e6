"""HTTP integration tests: both REST surfaces end-to-end, in-process.

Ports the reference's live e2e test (tests/integration/main.rs:83-143 —
create → list → add docs → poll search → top-1) and the vestigial ANN
client surface (tests/integration/httpclient.rs), with aiohttp's test
client replacing reqwest; no external services.
"""

import asyncio

import pytest
from aiohttp.test_utils import TestClient, TestServer

from vector_store_tpu import new_index_factory
from vector_store_tpu.api.routes import build_app
from vector_store_tpu.engine.engine import new_engine


async def _make_client():
    engine = await new_engine(new_index_factory())
    app = build_app(engine)
    c = TestClient(TestServer(app))
    await c.start_server()
    return c, engine


@pytest.mark.asyncio
async def test_text_search_e2e():
    """Reference live e2e flow (tests/integration/main.rs:83-143)."""
    c, engine = await _make_client()
    try:
        # empty list
        r = await c.get("/api/v1/text-search")
        assert r.status == 200 and await r.json() == []

        # create
        r = await c.put("/api/v1/text-search/articles")
        assert r.status == 200
        r = await c.get("/api/v1/text-search")
        assert await r.json() == ["articles"]

        # add two docs (acked)
        r = await c.post(
            "/api/v1/text-search/articles/add",
            json={"id": "doc1", "text": "the quick brown fox jumps over the lazy dog"},
        )
        assert r.status == 200
        r = await c.post(
            "/api/v1/text-search/articles/add",
            json={"id": "doc2", "text": "a fast auburn vulpine leaps over a sleepy canine"},
        )
        assert r.status == 200

        # poll-search until indexed, assert top-1 (main.rs:117-132)
        async with asyncio.timeout(60):
            while True:
                r = await c.post(
                    "/api/v1/text-search/articles/search",
                    json={"text": "quick fox", "limit": 2},
                )
                assert r.status == 200
                keys = await r.json()
                if keys and keys[0] == "doc1":
                    break
                await asyncio.sleep(0)

        # 404s for unknown index (httproutes.rs:104,137)
        r = await c.post("/api/v1/text-search/missing/add", json={"id": "x", "text": "y"})
        assert r.status == 404
        r = await c.post("/api/v1/text-search/missing/search", json={"text": "y"})
        assert r.status == 404

        # PUT recreates: doc count resets (httproutes.rs:76-79 del+add)
        r = await c.put("/api/v1/text-search/articles")
        assert r.status == 200
        r = await c.post(
            "/api/v1/text-search/articles/search", json={"text": "quick fox"}
        )
        assert await r.json() == []
    finally:
        await c.close()
        await engine.close()


@pytest.mark.asyncio
async def test_ann_surface_e2e():
    """Vestigial ANN REST surface (httpclient.rs:35-80) + extensions."""
    c, engine = await _make_client()
    try:
        r = await c.get("/api/v1/indexes")
        assert await r.json() == []

        # create with params (extension; discovery path tested in ingest)
        r = await c.put(
            "/api/v1/indexes/ks/vec",
            json={"dimensions": 3, "space": "l2", "key_columns": ["id", "name"]},
        )
        assert r.status == 200
        assert await (await c.get("/api/v1/indexes")).json() == ["ks.vec"]

        for pk, emb in [
            ([1, "one"], [1.0, 1.0, 1.0]),
            ([2, "two"], [2.0, -2.0, 2.0]),
            ([3, "three"], [3.0, 3.0, 3.0]),
        ]:
            r = await c.post(
                "/api/v1/indexes/ks/vec/add",
                json={"primary_key": pk, "embedding": emb},
            )
            assert r.status == 200

        async with asyncio.timeout(60):
            while True:
                r = await c.get("/api/v1/indexes/ks/vec/count")
                if await r.json() == 3:
                    break
                await asyncio.sleep(0)

        r = await c.post(
            "/api/v1/indexes/ks/vec/ann",
            json={"embedding": [2.2, -2.2, 2.2], "limit": 1},
        )
        assert r.status == 200
        body = await r.json()
        # column-major primary keys (httpclient.rs:46-66)
        assert body["primary_keys"] == {"id": [2], "name": ["two"]}
        assert len(body["distances"]) == 1

        # dimension mismatch → 400 with message (usearch.rs:259-272)
        r = await c.post(
            "/api/v1/indexes/ks/vec/ann", json={"embedding": [1.0], "limit": 1}
        )
        assert r.status == 400
        assert "dimensions" in await r.text()

        # remove + count (extension remove; count: httpclient.rs:68-80)
        r = await c.post(
            "/api/v1/indexes/ks/vec/remove", json={"primary_key": [3, "three"]}
        )
        assert r.status == 200
        async with asyncio.timeout(60):
            while await (await c.get("/api/v1/indexes/ks/vec/count")).json() != 2:
                await asyncio.sleep(0)

        # unknown index → 404
        r = await c.post(
            "/api/v1/indexes/ks/nope/ann", json={"embedding": [1, 2, 3]}
        )
        assert r.status == 404

        # drop
        r = await c.delete("/api/v1/indexes/ks/vec")
        assert r.status == 200
        assert await (await c.get("/api/v1/indexes")).json() == []
    finally:
        await c.close()
        await engine.close()


@pytest.mark.asyncio
async def test_exact_kind_over_http():
    """kind=exact serves brute-force (recall-1.0) search over the same API."""
    c, engine = await _make_client()
    try:
        r = await c.put(
            "/api/v1/indexes/ks/ex",
            json={"dimensions": 4, "space": "l2", "kind": "exact"},
        )
        assert r.status == 200
        for i in range(5):
            r = await c.post(
                "/api/v1/indexes/ks/ex/add",
                json={"primary_key": [i], "embedding": [i, 0, 0, 0]},
            )
            assert r.status == 200
        async with asyncio.timeout(60):
            while await (await c.get("/api/v1/indexes/ks/ex/count")).json() != 5:
                await asyncio.sleep(0)
        r = await c.post(
            "/api/v1/indexes/ks/ex/ann", json={"embedding": [3.1, 0, 0, 0], "limit": 2}
        )
        body = await r.json()
        assert body["primary_keys"]["pk0"] == [3, 4]  # exact: 0.01 < 0.81

        # info endpoint (extension)
        r = await c.get("/api/v1/indexes/ks/ex")
        info = await r.json()
        assert info["kind"] == "exact"
        assert info["params"]["dimensions"] == 4
        assert info["count"] == 5
        assert (await c.get("/api/v1/indexes/ks/missing")).status == 404
    finally:
        await c.close()
        await engine.close()


@pytest.mark.asyncio
async def test_openapi_and_health():
    c, engine = await _make_client()
    try:
        r = await c.get("/api-docs/openapi.json")
        spec = await r.json()
        assert spec["openapi"].startswith("3.")
        assert "/api/v1/text-search/{index}/search" in spec["paths"]
        r = await c.get("/swagger-ui")
        assert r.status == 200 and "swagger-ui" in await r.text()
        r = await c.get("/healthz")
        assert (await r.json())["status"] == "ok"
    finally:
        await c.close()
        await engine.close()


@pytest.mark.asyncio
async def test_openapi_spec_matches_registered_routes():
    """Spec-drift guard: the hand-written OpenAPI document must list
    exactly the routes build_app registers (the reference derived its
    spec from utoipa macros, so it could never drift; hand-written specs
    can, and did — round-2 caught /compact missing)."""
    from vector_store_tpu.api.openapi import openapi_spec
    from vector_store_tpu.api.routes import build_app
    from vector_store_tpu.engine import AnnIndexFactory, new_engine

    engine = await new_engine(AnnIndexFactory())
    try:
        app = build_app(engine)
        registered = {
            r.resource.canonical
            for r in app.router.routes()
            if r.resource is not None
        }
        # the docs surface documents the API, not itself
        registered -= {"/api-docs/openapi.json", "/swagger-ui"}
        spec_paths = set(openapi_spec()["paths"])
        assert spec_paths == registered, (
            f"spec missing: {registered - spec_paths}; "
            f"spec stale: {spec_paths - registered}"
        )
    finally:
        await engine.close()


@pytest.mark.asyncio
async def test_object_primary_key_over_http():
    """JSON-object primary keys map to (hashable) column tuples; bad keys
    get a 400, never an orphan device row (round-2 regression: a dict key
    used to slip through as an unhashable tuple AFTER the device insert,
    so count() grew but search/remove could never reach the row)."""
    c, engine = await _make_client()
    try:
        r = await c.put(
            "/api/v1/indexes/ks/obj",
            json={"dimensions": 4, "key_columns": ["id", "name"]},
        )
        assert r.status == 200

        # object form, fields in any order — ordered by key_columns
        r = await c.post(
            "/api/v1/indexes/ks/obj/add",
            json={
                "primary_key": {"name": "one", "id": 1},
                "embedding": [1.0, 0.0, 0.0, 0.0],
            },
        )
        assert r.status == 200
        async with asyncio.timeout(60):
            while await (await c.get("/api/v1/indexes/ks/obj/count")).json() != 1:
                await asyncio.sleep(0)

        r = await c.post(
            "/api/v1/indexes/ks/obj/ann",
            json={"embedding": [1.0, 0.0, 0.0, 0.0], "limit": 1},
        )
        body = await r.json()
        assert body["primary_keys"] == {"id": [1], "name": ["one"]}

        # missing a declared column → 400, count unchanged
        r = await c.post(
            "/api/v1/indexes/ks/obj/add",
            json={"primary_key": {"id": 2}, "embedding": [0.0, 1.0, 0.0, 0.0]},
        )
        assert r.status == 400
        # nested (unhashable) value → 400, count unchanged
        r = await c.post(
            "/api/v1/indexes/ks/obj/add",
            json={
                "primary_key": {"id": 2, "name": {"nested": True}},
                "embedding": [0.0, 1.0, 0.0, 0.0],
            },
        )
        assert r.status == 400
        assert await (await c.get("/api/v1/indexes/ks/obj/count")).json() == 1

        # object remove round-trips through the same mapping
        r = await c.post(
            "/api/v1/indexes/ks/obj/remove",
            json={"primary_key": {"id": 1, "name": "one"}},
        )
        assert r.status == 200
        async with asyncio.timeout(60):
            while await (await c.get("/api/v1/indexes/ks/obj/count")).json() != 0:
                await asyncio.sleep(0)
    finally:
        await c.close()
        await engine.close()


@pytest.mark.asyncio
async def test_request_deadline_504(monkeypatch):
    """VST_REQUEST_TIMEOUT_S bounds query requests: a wedged device
    dispatch surfaces as 504, not a hung connection (off by default)."""
    from vector_store_tpu.api import routes as routes_mod

    c, engine = await _make_client()
    try:
        await c.put("/api/v1/text-search/articles")
        r = await c.post(
            "/api/v1/text-search/articles/add",
            json={"id": "d1", "text": "hello deadline"},
        )
        assert r.status == 200

        from vector_store_tpu.types import IndexId

        index = await engine.get_index(IndexId("articles"))

        async def stuck_search(text, limit):
            await asyncio.sleep(30)

        monkeypatch.setattr(index, "search", stuck_search)
        monkeypatch.setattr(routes_mod, "REQUEST_TIMEOUT_S", 0.05)
        r = await c.post(
            "/api/v1/text-search/articles/search",
            json={"text": "hello", "limit": 1},
        )
        assert r.status == 504

        # deadline off (default) → normal path unaffected
        monkeypatch.setattr(routes_mod, "REQUEST_TIMEOUT_S", 0.0)
        monkeypatch.undo()  # restore the real search
        r = await c.post(
            "/api/v1/text-search/articles/search",
            json={"text": "hello", "limit": 1},
        )
        assert r.status == 200
    finally:
        await c.close()
        await engine.close()
