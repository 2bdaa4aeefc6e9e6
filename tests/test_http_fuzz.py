"""Malformed-input battery for both REST surfaces.

Every garbage request must come back as a structured 4xx/5xx from OUR
handlers — never aiohttp's default HTML error page ("Server got itself
in trouble", which means an exception escaped the route), never a hang.
The reference's axum handlers get this for free from the extractor
layer (httproutes.rs); here each handler owns its parsing.
"""

import asyncio
import math

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


def _not_default_error_page(status: int, body: str) -> None:
    assert status < 500 or "trouble" not in body, (status, body)
    assert status != 405, (status, body)  # wrong-method probes excluded


@pytest.mark.asyncio
async def test_malformed_requests_never_escape_handlers():
    c, engine = await _make_client()
    try:
        # live indexes to aim at
        r = await c.put("/api/v1/indexes/ks/vec", json={"dimensions": 4})
        assert r.status == 200
        r = await c.put("/api/v1/text-search/t")
        assert r.status == 200

        cases = [
            # (method, path, payload-kwargs)
            ("post", "/api/v1/indexes/ks/vec/ann", {"data": b"{not json"}),
            ("post", "/api/v1/indexes/ks/vec/ann", {"json": {}}),
            ("post", "/api/v1/indexes/ks/vec/ann", {"json": {"embedding": "x"}}),
            (
                "post",
                "/api/v1/indexes/ks/vec/ann",
                {"json": {"embedding": [1, 2], "limit": 5}},  # wrong dims
            ),
            (
                "post",
                "/api/v1/indexes/ks/vec/ann",
                {"json": {"embedding": [1, 2, 3, 4], "limit": -3}},
            ),
            (
                "post",
                "/api/v1/indexes/ks/vec/ann",
                {"json": {"embedding": [1, 2, 3, 4], "limit": "many"}},
            ),
            (
                "post",
                "/api/v1/indexes/ks/vec/ann",
                {
                    "json": {
                        "embedding": [math.nan, 1.0, 2.0, 3.0],
                        "limit": 2,
                    }
                },
            ),
            (
                "post",
                "/api/v1/indexes/ks/vec/ann",
                {"json": {"embedding": [[1, 2], [3, 4]], "limit": 1}},
            ),
            ("post", "/api/v1/indexes/ks/vec/add", {"json": {}}),
            (
                "post",
                "/api/v1/indexes/ks/vec/add",
                {"json": {"primary_key": "k", "embedding": [1]}},
            ),
            (
                "post",
                "/api/v1/indexes/ks/vec/add",
                {"json": {"primary_key": [[1]], "embedding": [1, 2, 3, 4]}},
            ),
            (
                "post",
                "/api/v1/indexes/ks/vec/add",
                {
                    "json": {
                        "primary_key": {"a": {"b": 1}},
                        "embedding": [1, 2, 3, 4],
                    }
                },
            ),
            ("post", "/api/v1/indexes/ks/vec/remove", {"json": {}}),
            ("post", "/api/v1/text-search/t/add", {"json": {}}),
            ("post", "/api/v1/text-search/t/add", {"json": {"id": "a"}}),
            ("post", "/api/v1/text-search/t/add", {"data": b"\xff\xfe"}),
            ("post", "/api/v1/text-search/t/search", {"json": {}}),
            (
                "post",
                "/api/v1/text-search/t/search",
                {"json": {"text": "a", "limit": 0}},
            ),
            (
                "post",
                "/api/v1/text-search/t/search",
                {"json": {"text": 42, "limit": 1}},
            ),
            # unknown index ids keep 404 semantics even with bad bodies
            ("post", "/api/v1/indexes/no/idx/ann", {"data": b"???"}),
            ("post", "/api/v1/text-search/missing/search", {"json": {}}),
        ]
        for method, path, kw in cases:
            r = await asyncio.wait_for(
                getattr(c, method)(path, **kw), timeout=30
            )
            body = await r.text()
            is_query = path.endswith(("/search", "/ann"))
            assert r.status != 200 or is_query, (
                # queries may legitimately succeed on degenerate-but-
                # well-shaped input (e.g. a NaN embedding scores nothing
                # and returns empty); mutations must reject garbage
                method,
                path,
                kw,
                r.status,
                body,
            )
            _not_default_error_page(r.status, body)

        # the index must still be alive and serving after the battery
        r = await c.post(
            "/api/v1/indexes/ks/vec/add",
            json={"primary_key": "ok", "embedding": [1, 2, 3, 4]},
        )
        assert r.status == 200
        r = await c.post(
            "/api/v1/indexes/ks/vec/ann",
            json={"embedding": [1, 2, 3, 4], "limit": 1},
        )
        assert r.status == 200
    finally:
        await c.close()
        await engine.close()
