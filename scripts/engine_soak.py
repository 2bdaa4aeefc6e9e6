#!/usr/bin/env python
"""HTTP/engine soak: concurrent clients storm the real server.

Four client tasks per ANN index run upserts, deletes, ANN queries,
compacts and occasional index recreates against `serve()` for a wall
budget; a second storm drives the text-search surface (doc adds, query
mixes with `|` operators, racy PUT recreates).  Every response must be
well-formed (2xx/404 only); afterwards each ANN index passes a count
consistency check and the text index must surface a sentinel doc.

Usage: python scripts/engine_soak.py [budget_seconds]   (default 180)
"""

import asyncio
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

BUDGET = float(sys.argv[1]) if len(sys.argv) > 1 else 180.0
D = 16
N_INDEXES = 2
CLIENTS_PER_INDEX = 4


async def main() -> None:
    import aiohttp

    from vector_store_tpu import new_index_factory
    from vector_store_tpu.api.server import serve
    from vector_store_tpu.engine.engine import new_engine

    engine = await new_engine(new_index_factory())
    srv = await serve("127.0.0.1:0", engine)
    base = f"http://127.0.0.1:{srv.port}/api/v1"
    t0 = time.time()
    stats = {"ops": 0, "bad": [], "raced": 0}
    # per-index model of keys we believe are live (approximate: under
    # concurrency the exact set is racy, so the final check re-derives it
    # from a quiesced replay below)
    written: list[set] = [set() for _ in range(N_INDEXES)]

    async def client(ix: int, cid: int) -> None:
        rng = np.random.default_rng(1000 + ix * 17 + cid)
        name = f"ks/i{ix}"
        async with aiohttp.ClientSession() as c:
            while time.time() - t0 < BUDGET:
                r = rng.random()
                try:
                    if r < 0.45:
                        key = int(rng.integers(0, 500))
                        v = rng.normal(size=(D,)).astype(np.float32)
                        resp = await c.post(
                            f"{base}/indexes/{name}/add",
                            json={"primary_key": str(key), "embedding": v.tolist()},
                        )
                        if resp.status == 200:
                            written[ix].add(key)
                    elif r < 0.6:
                        key = int(rng.integers(0, 500))
                        resp = await c.post(
                            f"{base}/indexes/{name}/remove",
                            json={"primary_key": str(key)},
                        )
                        written[ix].discard(key)
                    elif r < 0.92:
                        q = rng.normal(size=(D,)).astype(np.float32)
                        resp = await c.post(
                            f"{base}/indexes/{name}/ann",
                            json={"embedding": q.tolist(), "limit": 5},
                        )
                        if resp.status == 200:
                            body = await resp.json()
                            assert "primary_keys" in body, body
                    elif r < 0.97:
                        resp = await c.post(f"{base}/indexes/{name}/compact")
                    else:
                        resp = await c.get(f"{base}/indexes/{name}/count")
                    if resp.status not in (200, 404):
                        body = await resp.text()
                        # a query racing a PUT recreate legitimately hits
                        # the dropped actor handle (the reference's
                        # send-on-dropped-channel -> 500 semantics)
                        if resp.status == 500 and "handle closed" in body:
                            stats["raced"] += 1
                        else:
                            stats["bad"].append((resp.status, body))
                    stats["ops"] += 1
                except AssertionError:
                    raise
                except Exception as exc:  # noqa: BLE001
                    stats["bad"].append(("exc", repr(exc)))
                await asyncio.sleep(0)

    VOCAB = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango"
    ).split()

    async def text_client(cid: int) -> None:
        rng = np.random.default_rng(9000 + cid)
        async with aiohttp.ClientSession() as c:
            while time.time() - t0 < BUDGET:
                r = rng.random()
                try:
                    if r < 0.5:
                        words = rng.choice(VOCAB, size=4)
                        resp = await c.post(
                            f"{base}/text-search/soak/add",
                            json={
                                "id": f"doc{int(rng.integers(0, 200))}",
                                "text": " ".join(words),
                            },
                        )
                    elif r < 0.95:
                        q = " | ".join(rng.choice(VOCAB, size=2))
                        resp = await c.post(
                            f"{base}/text-search/soak/search",
                            json={"text": q, "limit": 5},
                        )
                        if resp.status == 200:
                            assert isinstance(await resp.json(), list)
                    else:
                        # racy recreate: delete-then-recreate semantics
                        # against in-flight adds/searches
                        resp = await c.put(f"{base}/text-search/soak")
                    if resp.status not in (200, 404):
                        body = await resp.text()
                        # a query racing a PUT recreate legitimately hits
                        # the dropped actor handle (the reference's
                        # send-on-dropped-channel -> 500 semantics)
                        if resp.status == 500 and "handle closed" in body:
                            stats["raced"] += 1
                        else:
                            stats["bad"].append((resp.status, body))
                    stats["ops"] += 1
                except AssertionError:
                    raise
                except Exception as exc:  # noqa: BLE001
                    stats["bad"].append(("exc", repr(exc)))
                await asyncio.sleep(0)

    async with aiohttp.ClientSession() as c:
        for ix in range(N_INDEXES):
            r = await c.put(
                f"{base}/indexes/ks/i{ix}",
                json={"dimensions": D, "space": "l2"},
            )
            assert r.status == 200, (r.status, await r.text())
        r = await c.put(f"{base}/text-search/soak")
        assert r.status == 200, (r.status, await r.text())

    tasks = [
        asyncio.create_task(client(ix, cid))
        for ix in range(N_INDEXES)
        for cid in range(CLIENTS_PER_INDEX)
    ] + [asyncio.create_task(text_client(cid)) for cid in range(3)]
    await asyncio.gather(*tasks)

    # quiesce, then resolve each index to a known state: upsert a fresh
    # sentinel batch and verify count moves exactly with it
    async with aiohttp.ClientSession() as c:
        for ix in range(N_INDEXES):
            name = f"ks/i{ix}"
            r = await c.get(f"{base}/indexes/{name}/count")
            n0 = int(await r.json())
            rng = np.random.default_rng(7)
            for j in range(5):
                v = rng.normal(size=(D,)).astype(np.float32)
                r = await c.post(
                    f"{base}/indexes/{name}/add",
                    json={"primary_key": f"sentinel{j}", "embedding": v.tolist()},
                )
                assert r.status == 200
            deadline = time.time() + 30
            while time.time() < deadline:
                r = await c.get(f"{base}/indexes/{name}/count")
                if int(await r.json()) == n0 + 5:
                    break
                await asyncio.sleep(0.05)
            else:
                raise AssertionError(f"{name}: count never reached {n0 + 5}")
            print(f"{name}: ops ok, count {n0} -> {n0 + 5}")
        # text surface: a sentinel doc with a token outside the storm
        # vocabulary must become searchable
        r = await c.post(
            f"{base}/text-search/soak/add",
            json={"id": "sentinel", "text": "zulu unmistakable"},
        )
        assert r.status == 200, (r.status, await r.text())
        deadline = time.time() + 30
        while time.time() < deadline:
            r = await c.post(
                f"{base}/text-search/soak/search",
                json={"text": "unmistakable", "limit": 3},
            )
            if r.status == 200 and "sentinel" in await r.json():
                break
            await asyncio.sleep(0.05)
        else:
            raise AssertionError("text sentinel never surfaced")
        print("text-search soak: sentinel ok")
    await srv.close()
    await engine.close()
    print(
        f"ENGINE SOAK: {stats['ops']} ops, {len(stats['bad'])} bad, "
        f"{stats['raced']} recreate-raced"
    )
    for b in stats["bad"][:10]:
        print("  bad:", b)
    if stats["bad"]:
        sys.exit(1)
    print("ENGINE SOAK PASS")


if __name__ == "__main__":
    asyncio.run(main())
