"""L0 bootstrap coverage: `python -m vector_store_tpu` wiring.

The reference boots in main.rs:16-44 (env → tracing → factory → server
→ wait for SIGINT/SIGTERM); here the same path is `__main__.main()`.
The e2e suites drive `serve()`/`build_app()` directly, so this is the
one layer they skip: argv parsing, Config, the `run()` wiring, the
--demo monitor attach, and the shutdown unwind.
"""

import asyncio
import sys

import pytest

import vector_store_tpu.__main__ as entry


@pytest.mark.asyncio
async def test_main_boots_serves_and_unwinds(monkeypatch):
    captured = {}
    real_run = entry.run

    async def spy_run(addr, factory):
        server, engine = await real_run(addr, factory)
        captured["server"] = server
        return server, engine

    async def fake_wait():
        # stands in for the SIGINT/SIGTERM latch: probe the live server,
        # then "receive the signal"
        import aiohttp

        server = captured["server"]
        async with aiohttp.ClientSession() as c:
            r = await c.get(f"http://127.0.0.1:{server.port}/healthz")
            assert r.status == 200
            r = await c.get(
                f"http://127.0.0.1:{server.port}/api/v1/text-search"
            )
            assert r.status == 200
            assert await r.json() == []

    monkeypatch.setattr(entry, "run", spy_run)
    monkeypatch.setattr(entry, "wait_for_shutdown", fake_wait)
    monkeypatch.setattr(
        sys, "argv", ["vector_store_tpu", "--addr", "127.0.0.1:0", "--demo"]
    )
    await asyncio.wait_for(entry.main(), timeout=60)
    # unwound: the port must be closed again
    import aiohttp

    with pytest.raises(aiohttp.ClientConnectorError):
        async with aiohttp.ClientSession() as c:
            await c.get(
                f"http://127.0.0.1:{captured['server'].port}/healthz",
                timeout=aiohttp.ClientTimeout(total=5),
            )
