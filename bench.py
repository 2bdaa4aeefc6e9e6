#!/usr/bin/env python
"""Headline benchmark — prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: QPS/chip at recall@10 >= 0.95 on an N x 768-d cosine corpus
(BASELINE.md north star).  The corpus is a deterministic clustered
synthetic standing in for real embedding distributions (Cohere/GloVe-
like; the benchmark datasets themselves are not fetchable offline —
point VST_BENCH_FVECS at an .fvecs file to bench real data instead).

Beyond the headline, stderr carries the BASELINE.md config ladder:
  config 2 — the FULL recall/QPS tradeoff curve (every ef rung timed,
             every probe rung timed; nothing trimmed at large N)
  config 3 — streaming-ingest rate through the real pipeline
             (MemDb scan → monitor_items → index actor), i8-quantized
  config 4 — churn: delete 30% + reinsert, recall before/after compact

vs_baseline: ratio against the local CPU-HNSW anchor (the usearch-CPU
role; BASELINE.md requires the anchor measured locally on the same
data).  The CPU anchor is cached in bench_baseline.json because the
single-core build takes ~an hour at 100K — delete the file to re-measure.

Env knobs: VST_BENCH_N (corpus size, default 1M), VST_BENCH_Q (queries,
default 2048), VST_BENCH_SKIP_BASELINE=1 (report vs_baseline from cache
or 0.0), VST_BENCH_LITE=1 (headline candidates only — skip configs 3/4
and the int8 variants; for quick local iteration).
"""

from __future__ import annotations

import dataclasses
import gc
import json
import os
import sys
import time

import numpy as np

N = int(os.environ.get("VST_BENCH_N", "1000000"))  # BASELINE.md north star scale
D = int(os.environ.get("VST_BENCH_D", "768"))
Q = int(os.environ.get("VST_BENCH_Q", "2048"))
K = 10
TARGET_RECALL = 0.95
SEED = 42
LITE = os.environ.get("VST_BENCH_LITE") == "1"
BASELINE_CACHE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json"
)

# search configs swept cheapest-first (config 2: the whole curve is timed)
EF_LADDER = (
    dict(ef_search=48, iters=10, beam_width=6),
    dict(ef_search=64, iters=12, beam_width=6),
    dict(ef_search=96, iters=16, beam_width=8),
    dict(ef_search=128, iters=20, beam_width=8),
    dict(ef_search=192, iters=24, beam_width=8),
    dict(ef_search=256, iters=32, beam_width=8),
)
PROBE_LADDER = (4, 8, 16, 32)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def make_dataset(n: int, d: int, q: int, seed: int = SEED):
    """Deterministic clustered corpus + in-distribution queries."""
    fvecs = os.environ.get("VST_BENCH_FVECS")
    rng = np.random.default_rng(seed)
    if fvecs:
        from vector_store_tpu.utils.native import read_fvecs

        x = read_fvecs(fvecs, n, d)
        qi = rng.choice(len(x), q, replace=False)
        queries = x[qi] + 0.05 * x[qi].std() * rng.normal(
            size=(q, x.shape[1])
        ).astype(np.float32)
        return x, queries.astype(np.float32)
    n_clusters = max(n // 50, 16)
    centers = rng.normal(size=(n_clusters, d)).astype(np.float32)
    x = centers[rng.integers(0, n_clusters, n)] + 0.35 * rng.normal(
        size=(n, d)
    ).astype(np.float32)
    qi = rng.choice(n, q, replace=False)
    queries = x[qi] + 0.25 * rng.normal(size=(q, d)).astype(np.float32)
    return x, queries


def recall_of(ids: np.ndarray, exact: np.ndarray) -> float:
    q, k = exact.shape
    return float(
        np.mean(
            [
                len(set(ids[i][:k].tolist()) & set(exact[i].tolist())) / k
                for i in range(q)
            ]
        )
    )


class DeviceTimer:
    """Honest device timing on a noisy remote backend: distinct inputs
    per rep (duplicate dispatches are elided), completion forced through
    one jitted combine + scalar readback (block_until_ready returns
    early here), min over blocks (tunnel latency noise is one-sided)."""

    def __init__(self):
        import jax
        import jax.numpy as jnp

        @jax.jit
        def _combine(*xs):
            return sum(x[0, 0].astype(jnp.float32) for x in xs)

        self._combine = _combine

    def qps(self, fn, n_queries: int, reps=10, blocks=3) -> float:
        outs = [fn(r) for r in range(reps)]
        float(np.asarray(self._combine(*[o[0] for o in outs])))  # warm
        best = float("inf")
        for _ in range(blocks):
            t0 = time.time()
            outs = [fn(r) for r in range(reps)]
            float(np.asarray(self._combine(*[o[0] for o in outs])))
            best = min(best, (time.time() - t0) / reps)
        return n_queries / best


def bench_tpu(x: np.ndarray, queries: np.ndarray) -> dict:
    """Bench every device backend — exact MXU scan (f32 + int8), graph
    beam search (full ef curve), IVF bucketed scan (full probe curve) —
    and report the fastest one clearing the recall bar.  All are
    first-class index kinds in the service; a user picks per collection."""
    import jax
    import jax.numpy as jnp

    from vector_store_tpu.core import SlotIndex, bruteforce
    from vector_store_tpu.core import distance as dist_mod
    from vector_store_tpu.core import search as search_mod
    from vector_store_tpu.types import IndexParams

    n, d = x.shape
    cap = max(1 << 16, 1 << (n - 1).bit_length())
    timer = DeviceTimer()
    candidates = []
    build_rates = {}

    qp_f32 = None  # preprocessed queries, reused across phases
    exact = None  # ground truth ids [Q, K]

    # ---- phase A: exact scan (f32 storage) + ground truth -----------------
    exact_idx = SlotIndex(
        IndexParams(dimensions=d, space="cosine", capacity=n),
        initial_capacity=cap,
        exact=True,
    )
    t0 = time.time()
    exact_idx.add(x)
    scan_build_s = time.time() - t0
    build_rates["scan"] = n / scan_build_s
    log(f"# scan ingest: {build_rates['scan']:.0f} vec/s")

    state = exact_idx.state
    qp_f32 = dist_mod.preprocess(jnp.asarray(queries), "cosine").astype(
        exact_idx.cfg.compute_dtype
    )
    _, exact_ids = bruteforce.search(
        qp_f32, state.vectors, state.valid, "cosine", K, approx=False
    )
    exact = np.asarray(exact_ids)

    qp_vars = [jnp.roll(qp_f32, r, axis=0) for r in range(12)]
    scan_qps = timer.qps(
        lambda r: bruteforce.search(
            qp_vars[r % 12], state.vectors, state.valid, "cosine", K
        ),
        len(queries),
    )
    out = bruteforce.search(qp_vars[0], state.vectors, state.valid, "cosine", K)
    scan_rec = recall_of(np.asarray(out[1]), exact)
    log(f"# scan: recall@10={scan_rec:.3f} qps={scan_qps:.0f}")
    if scan_rec >= TARGET_RECALL:
        candidates.append(("exact-scan", scan_qps, scan_rec))

    # serving-latency probe: single small batch per call, p50/p99
    try:
        q8 = [jnp.roll(qp_f32[:8], r, axis=0) for r in range(30)]
        lat = []
        float(
            np.asarray(
                bruteforce.search(
                    q8[0], state.vectors, state.valid, "cosine", K
                )[0][0, 0]
            )
        )
        for r in range(30):
            t0 = time.time()
            o = bruteforce.search(q8[r], state.vectors, state.valid, "cosine", K)
            float(np.asarray(o[0][0, 0]))
            lat.append(time.time() - t0)
        lat.sort()
        log(
            f"# scan latency (batch=8, host-roundtrip incl): "
            f"p50={lat[14] * 1000:.1f}ms p99={lat[-1] * 1000:.1f}ms"
        )
    except Exception as exc:  # noqa: BLE001 — latency probe is best-effort
        log(f"# latency probe failed: {exc}")

    del state, exact_idx, out
    gc.collect()

    # ---- phase A2: exact scan, int8 storage (quantized memory parity) -----
    if not LITE:
        i8_idx = SlotIndex(
            IndexParams(dimensions=d, space="cosine", capacity=n, dtype="int8"),
            initial_capacity=cap,
            exact=True,
        )
        t0 = time.time()
        i8_idx.add(x)
        build_rates["scan-int8"] = n / (time.time() - t0)
        s8 = i8_idx.state
        i8_qps = timer.qps(
            lambda r: bruteforce.search(
                qp_vars[r % 12],
                s8.vectors,
                s8.valid,
                "cosine",
                K,
                scales=s8.scales,
            ),
            len(queries),
        )
        o8 = bruteforce.search(
            qp_vars[0], s8.vectors, s8.valid, "cosine", K, scales=s8.scales
        )
        i8_rec = recall_of(np.asarray(o8[1]), exact)
        log(f"# scan-int8: recall@10={i8_rec:.3f} qps={i8_qps:.0f}")
        if i8_rec >= TARGET_RECALL:
            candidates.append(("exact-scan-int8", i8_qps, i8_rec))
        del i8_idx, s8, o8
        gc.collect()

    # ---- phase B: graph index, FULL ef curve (config 2) -------------------
    idx = SlotIndex(
        IndexParams(dimensions=d, space="cosine", capacity=n),
        initial_capacity=cap,
        insert_block=1024,
    )
    t0 = time.time()
    idx.add(x)
    build_s = time.time() - t0
    build_rates["graph"] = n / build_s

    qdev_vars = [jnp.roll(jnp.asarray(queries), r, axis=0) for r in range(12)]
    best_graph = None
    log("# config-2 curve (graph ef sweep, all rungs timed):")
    for knobs in EF_LADDER:
        cfg = dataclasses.replace(idx.cfg, **knobs)
        d_, i_ = search_mod.search(idx.state, qdev_vars[0], cfg, K)
        jax.block_until_ready((d_, i_))
        rec = recall_of(np.asarray(i_), exact)
        qps = timer.qps(
            lambda r: search_mod.search(
                idx.state, qdev_vars[r % 12], cfg, K
            ),
            len(queries),
            reps=6,
            blocks=2,
        )
        log(f"#   graph ef={knobs['ef_search']}: recall@10={rec:.3f} qps={qps:.0f}")
        if best_graph is None or (
            rec >= TARGET_RECALL
            and (best_graph[2] < TARGET_RECALL or qps > best_graph[1])
        ):
            best_graph = (f"graph-ef{cfg.ef_search}", qps, rec)
    name, qps, rec = best_graph
    log(f"# graph best: {name} recall@10={rec:.3f} qps={qps:.0f}")
    if rec >= TARGET_RECALL or not candidates:
        candidates.append(best_graph)
    del idx
    gc.collect()

    # ---- phase C: IVF bucketed backend, full probe curve + churn ----------
    if not LITE:
        from vector_store_tpu.core.ivf import IvfIndex, search_clustered

        ivf = IvfIndex(
            IndexParams(dimensions=d, space="cosine", dtype="int8"),
            initial_capacity=n,
        )
        t0 = time.time()
        ivf.add(x)
        build_rates["ivf-int8"] = n / (time.time() - t0)
        log(
            f"# ivf ingest: {build_rates['ivf-int8']:.0f} vec/s "
            f"(clusters={ivf.n_clusters}, bucket={ivf.state.bucket})"
        )
        best_ivf = None
        qraw_vars = [np.roll(queries, r, axis=0) for r in range(12)]
        qdev = [jnp.asarray(qv) for qv in qraw_vars]
        fused_ok = ivf._fused_ok()
        if fused_ok:
            from vector_store_tpu.core.ivf_pallas import (
                search_clustered_fused,
            )
        log("# config-2 curve (ivf probe sweep, all rungs timed):")
        for probes in PROBE_LADDER:
            d_, i_ = ivf.search(queries, K, probes=probes)
            rec = recall_of(i_, exact)
            st = ivf.state
            qps = timer.qps(
                lambda r: search_clustered(
                    st, qdev[r % 12], "cosine", K, probes
                ),
                len(queries),
                reps=6,
                blocks=2,
            )
            line = f"#   ivf probes={probes}: recall@10={rec:.3f} qps={qps:.0f}"
            name = f"ivf-p{probes}"
            if fused_ok:
                # one fused dispatch is SMEM-capped at ~1024 queries
                half = len(queries) // 2

                def fused_run(r):
                    a = search_clustered_fused(
                        st, qdev[r % 12][:half], "cosine", K, probes
                    )
                    b = search_clustered_fused(
                        st, qdev[r % 12][half:], "cosine", K, probes
                    )
                    return a[0], b[0]

                fused_qps = timer.qps(
                    fused_run, len(queries), reps=6, blocks=2
                )
                line += f" fused_qps={fused_qps:.0f}"
                if fused_qps > qps:
                    qps, name = fused_qps, f"ivf-fused-p{probes}"
            log(line)
            if best_ivf is None or (
                rec >= TARGET_RECALL
                and (best_ivf[2] < TARGET_RECALL or qps > best_ivf[1])
            ):
                best_ivf = (name, qps, rec)
            if rec >= TARGET_RECALL and probes >= 8:
                break  # rungs past the bar only get slower
        log(f"# ivf best: {best_ivf[0]} recall@10={best_ivf[2]:.3f} qps={best_ivf[1]:.0f}")
        if best_ivf[2] >= TARGET_RECALL:
            candidates.append(best_ivf)

        bench_churn(ivf, x, exact_probes=int(best_ivf[0].split("p")[-1]))
        del ivf
        gc.collect()

    name, qps, rec = max(candidates, key=lambda c: c[1])
    return {
        "qps": qps,
        "recall": rec,
        "build_s": build_s,
        "build_rate": build_rates.get("graph", 0.0),
        "backend": name,
    }


def bench_churn(ivf, x: np.ndarray, exact_probes: int) -> None:
    """Config 4 — recall under churn: delete 30%, reinsert fresh rows,
    measure recall against an exact scan of the MUTATED bank, compact
    (recluster), measure again (tombstone/compaction, DEEP-churn role)."""
    rng = np.random.default_rng(7)
    n = len(x)
    n_kill = int(0.3 * n)
    kill = rng.choice(n, n_kill, replace=False).astype(np.int64)
    t0 = time.time()
    ivf.remove(kill)
    fresh = x[kill] + 0.1 * rng.normal(size=(n_kill, x.shape[1])).astype(
        np.float32
    )
    new_ids = ivf.add(fresh)
    churn_s = time.time() - t0
    qi = rng.choice(n_kill, 512, replace=False)
    probes_q = fresh[qi] + 0.05 * rng.normal(
        size=(512, x.shape[1])
    ).astype(np.float32)

    _, gt = ivf.exact_search(probes_q, K)
    _, got = ivf.search(probes_q, K, probes=exact_probes)
    rec = recall_of(got, gt)
    t0 = time.time()
    ivf.compact()
    compact_s = time.time() - t0
    _, gt2 = ivf.exact_search(probes_q, K)
    # post-recluster the churned (near-duplicate-heavy) distribution can
    # oversubscribe hot clusters, spilling rows to 2nd..4th-choice
    # buckets — sweep probes so the curve, not one point, is on record
    post = {}
    for p in (exact_probes, 2 * exact_probes, 4 * exact_probes):
        _, got2 = ivf.search(probes_q, K, probes=p)
        post[p] = recall_of(got2, gt2)
    hit = float(np.mean(got2[:, 0] == new_ids[qi]))
    post_s = " ".join(f"p{p}={r:.3f}" for p, r in post.items())
    log(
        f"# config-4 churn (30% delete+reinsert @ {n}): recall@10={rec:.3f} "
        f"post-compact[{post_s}] top1-self={hit:.3f} "
        f"churn={churn_s:.0f}s compact={compact_s:.0f}s"
    )


def bench_ingest_pipeline() -> None:
    """Config 3 — streaming inserts through the REAL ingestion path:
    MemDb snapshot scan → EmbeddingStream → monitor_items LWW bridge →
    index actor (coalesced batched device inserts), i8-quantized 768-d.
    This is the rate a Scylla-CDC deployment would see, not a direct
    index.add() (round-1 gap: the pipeline rate was never measured)."""
    import asyncio

    n_ing = int(os.environ.get("VST_BENCH_INGEST_N", "250000"))
    d = D

    async def run() -> tuple[float, int]:
        from vector_store_tpu.engine import AnnIndexFactory
        from vector_store_tpu.ingest import monitor_items
        from vector_store_tpu.ingest.memdb import MemDb
        from vector_store_tpu.types import IndexParams

        rng = np.random.default_rng(11)
        db = MemDb()
        db.add_table("vectors", ("id",), d)
        # preload the table; the scan phase then streams it through the
        # monitor bridge exactly like a Scylla initial full scan
        tbl = db._tables["vectors"]
        for off in range(0, n_ing, 65536):
            m = min(65536, n_ing - off)
            vecs = rng.normal(size=(m, d)).astype(np.float32)
            for i in range(m):
                await db.insert_values("vectors", (off + i,), vecs[i])
        meta = db.add_index(
            "ks.stream",
            "vectors",
            IndexParams(dimensions=d, space="cosine", dtype="int8"),
        )
        del tbl

        factory = AnnIndexFactory(backend="ivf")
        handle = factory.create_index(meta.index_id, meta)
        t0 = time.time()
        stream = await db.get_db_index(meta)
        task = asyncio.create_task(monitor_items.run(stream, handle))
        while await handle.count() < n_ing:
            await asyncio.sleep(0.2)
        dt = time.time() - t0
        stream.stop()
        await stream.close()
        await task
        cnt = await handle.count()
        handle.close()
        await handle.join()
        return dt, cnt

    try:
        dt, cnt = asyncio.run(run())
        log(
            f"# config-3 ingest pipeline (memdb→monitor→actor, int8 {d}-d): "
            f"{cnt / dt:.0f} vec/s over {cnt} rows"
        )
    except Exception as exc:  # noqa: BLE001 — report, don't kill the headline
        log(f"# config-3 ingest pipeline failed: {exc!r}")


def bench_cpu_baseline(x: np.ndarray, queries: np.ndarray) -> dict:
    """CPU-HNSW anchor on identical data (cached)."""
    key = f"{N}x{D}-seed{SEED}"
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as fh:
            cache = json.load(fh)
        if key in cache:
            return cache[key]
    if os.environ.get("VST_BENCH_SKIP_BASELINE") == "1":
        return {"qps": 0.0, "recall": 0.0}

    from vector_store_tpu.utils.native import HnswBaseline

    n, d = x.shape
    t0 = time.time()
    h = HnswBaseline(d, m=16, ef_construction=128, space="cosine")
    h.add(x)
    build_s = time.time() - t0

    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    exact = np.argsort(1.0 - qn @ xn.T, axis=1)[:, :K]

    result = None
    for ef in (32, 48, 64, 96, 128, 192, 256):
        t0 = time.time()
        _, ids = h.search(queries, K, ef=ef)
        qps = len(queries) / (time.time() - t0)
        rec = recall_of(ids, exact)
        log(f"# cpu ef={ef}: recall={rec:.3f} qps={qps:.0f}")
        result = {"qps": qps, "recall": rec, "build_s": build_s, "ef": ef}
        if rec >= TARGET_RECALL:
            break

    cache = {}
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as fh:
            cache = json.load(fh)
    cache[key] = result
    with open(BASELINE_CACHE, "w") as fh:
        json.dump(cache, fh, indent=1)
    return result


def main() -> None:
    x, queries = make_dataset(N, D, Q)
    tpu = bench_tpu(x, queries)
    log(
        f"# tpu[{tpu['backend']}]: qps={tpu['qps']:.0f} recall={tpu['recall']:.3f} "
        f"build={tpu['build_rate']:.0f} vec/s"
    )
    if not LITE:
        bench_ingest_pipeline()
    base = bench_cpu_baseline(x, queries)
    vs = tpu["qps"] / base["qps"] if base.get("qps") else 0.0
    print(
        json.dumps(
            {
                "metric": f"QPS/chip at recall@10>={TARGET_RECALL} ({N}x{D}-d cosine)",
                "value": round(tpu["qps"], 1),
                "unit": "queries/s",
                "vs_baseline": round(vs, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
