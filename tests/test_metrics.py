"""Metrics registry + /metrics endpoint (beyond the reference, which has
no metrics surface — SURVEY §5 'no metrics registry, no health endpoint')."""

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from vector_store_tpu import new_index_factory
from vector_store_tpu.api.routes import build_app
from vector_store_tpu.engine.engine import new_engine
from vector_store_tpu.utils import metrics


def test_registry_render_prometheus_format():
    metrics.reset()
    metrics.counter("vst_test_total", kind="a").inc()
    metrics.counter("vst_test_total", kind="a").inc(2)
    metrics.counter("vst_test_total", kind="b").inc()
    metrics.histogram("vst_test_seconds").observe(0.0005)
    metrics.histogram("vst_test_seconds").observe(3.0)
    text = metrics.render()
    assert 'vst_test_total{kind="a"} 3' in text
    assert 'vst_test_total{kind="b"} 1' in text
    # cumulative buckets: the 0.5ms sample is in the first (le=0.001)
    assert 'vst_test_seconds_bucket{le="0.001"} 1' in text
    assert 'vst_test_seconds_bucket{le="+Inf"} 2' in text
    assert "vst_test_seconds_count 2" in text
    assert "vst_test_seconds_sum 3.0005" in text


def test_timed_context_observes():
    metrics.reset()
    with metrics.timed("vst_block_seconds", phase="x"):
        pass
    assert 'vst_block_seconds_count{phase="x"} 1' in metrics.render()


@pytest.mark.asyncio
async def test_metrics_endpoint_counts_requests_and_queries():
    metrics.reset()
    engine = await new_engine(new_index_factory())
    app = build_app(engine)
    c = TestClient(TestServer(app))
    await c.start_server()
    try:
        r = await c.put(
            "/api/v1/indexes/ks/m1",
            json={"dimensions": 8, "space": "cosine", "key_columns": ["id"]},
        )
        assert r.status == 200
        rng = np.random.default_rng(0)
        v = rng.standard_normal(8).astype(np.float32).tolist()
        r = await c.post(
            "/api/v1/indexes/ks/m1/add",
            json={"primary_key": 1, "embedding": v},
        )
        assert r.status == 200
        r = await c.post(
            "/api/v1/indexes/ks/m1/ann", json={"embedding": v, "limit": 1}
        )
        assert r.status == 200
        # a 404 must be labeled as such
        r = await c.post(
            "/api/v1/indexes/ks/absent/ann", json={"embedding": v, "limit": 1}
        )
        assert r.status == 404

        r = await c.get("/metrics")
        assert r.status == 200
        text = await r.text()
        assert (
            'vst_http_requests_total{method="POST",'
            'route="/api/v1/indexes/{keyspace}/{index}/ann",status="200"} 1'
            in text
        )
        assert 'status="404"} 1' in text
        assert 'vst_ann_queries_total{index="ks.m1"} 1' in text
        assert 'vst_ann_upserts_total{index="ks.m1"} 1' in text
        assert "vst_http_request_seconds_count" in text
        # /metrics itself is not counted
        assert 'route="/metrics"' not in text
    finally:
        await c.close()
        await engine.close()


def test_label_values_escaped():
    """User-controlled label values (index ids) with quotes/newlines
    must not corrupt the exposition payload."""
    metrics.reset()
    metrics.counter("vst_esc_total", index='ks.my"x\nback\\slash').inc()
    text = metrics.render()
    # the raw newline must not survive into the exposition line, and the
    # three escapable characters must appear escaped
    assert 'vst_esc_total{index="ks.my\\"x\\nback\\\\slash"} 1' in text
    assert all(
        ln.endswith(("1", "0")) or ln == "" for ln in text.splitlines()
    ), text
