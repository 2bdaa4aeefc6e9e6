#!/usr/bin/env python
"""Scale probe: graph recall/QPS at N with the hierarchical router.

Round-2 measurement harness for VERDICT items #2/#3 — runs on the real
chip.  Usage:
    python scripts/probe_scale.py [N] [dtype] [--flat]
Prints build rate, per-ef recall/QPS for graph + exact-scan reference.
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
DTYPE = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
FLAT = "--flat" in sys.argv
IVF = "--ivf" in sys.argv
D, Q, K = 768, 2048, 10
SEED = 42

from bench import EF_LADDER, make_dataset, recall_of  # noqa: E402


def main_ivf():
    """IVF bucketed backend at scale: build, probe sweep, churn."""
    import jax

    plat = os.environ.get("VST_BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    import jax.numpy as jnp

    from vector_store_tpu.core.ivf import IvfIndex, search_clustered
    from vector_store_tpu.types import IndexParams

    x, queries = make_dataset(N, D, Q)
    snap = f"/tmp/vst_ivf_{N}_{DTYPE}.npz"
    if os.path.exists(snap):
        t0 = time.time()
        idx = IvfIndex.load(snap)
        print(f"# ivf restored from {snap} in {time.time() - t0:.0f}s "
              f"clusters={idx.n_clusters} bucket={idx.state.bucket}", flush=True)
    else:
        idx = IvfIndex(
            IndexParams(dimensions=D, space="cosine", dtype=DTYPE),
            initial_capacity=N,
        )
        t0 = time.time()
        idx.add(x)
        build_s = time.time() - t0
        print(
            f"# ivf build: {N / build_s:.0f} vec/s ({build_s:.0f}s) "
            f"clusters={idx.n_clusters} bucket={idx.state.bucket}",
            flush=True,
        )
        idx.save(snap)
        print(f"# snapshot -> {snap}", flush=True)
    _, exact = idx.exact_search(queries, K)

    @jax.jit
    def _combine(*xs):
        return sum(v[0, 0].astype(jnp.float32) for v in xs)

    qdev = [jnp.asarray(np.roll(queries, r, axis=0)) for r in range(8)]

    def timed(fn):
        out = fn(0)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            outs = [fn(r) for r in range(8)]
            float(np.asarray(_combine(*[o[0] for o in outs])))
            best = min(best, (time.time() - t0) / 8)
        return Q / best

    fused_ok = idx._fused_ok()
    chunk = 256  # serving-path chunk; a 2048-query XLA gather transient
    # on top of a 14GB bank OOMs at 8M — time what serving actually runs

    def timed_chunked(fn):
        outs = [fn(0, o) for o in range(0, Q, chunk)]
        float(np.asarray(_combine(*[o[0] for o in outs])))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            outs = []
            for r in range(4):
                outs.extend(fn(r, o) for o in range(0, Q, chunk))
            float(np.asarray(_combine(*[o[0] for o in outs])))
            best = min(best, (time.time() - t0) / 4)
        return Q / best

    for probes in (4, 8, 16, 32):
        d_, i_ = idx.search(queries, K, probes=probes)
        rec = recall_of(i_, exact)
        print(f"# ivf probes={probes}: recall@10={rec:.3f}", flush=True)
        xla_qps = timed_chunked(
            lambda r, o: search_clustered(
                idx.state, qdev[r][o : o + chunk], "cosine", K, probes
            )
        )
        line = f"#   qps={xla_qps:.0f}"
        if fused_ok:
            from vector_store_tpu.core.ivf_pallas import search_clustered_fused

            fused_qps = timed_chunked(
                lambda r, o: search_clustered_fused(
                    idx.state, qdev[r][o : o + chunk], "cosine", K, probes
                )
            )
            line += f" fused_qps={fused_qps:.0f}"
        print(line, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from vector_store_tpu.core import SlotIndex, bruteforce
    from vector_store_tpu.core import distance as dist_mod
    from vector_store_tpu.core import search as search_mod
    from vector_store_tpu.types import IndexParams

    x, queries = make_dataset(N, D, Q)
    cap = max(1 << 16, 1 << (N - 1).bit_length())

    idx = SlotIndex(
        IndexParams(dimensions=D, space="cosine", capacity=N, dtype=DTYPE),
        initial_capacity=cap,
        insert_block=1024,
    )
    if FLAT:
        idx._route_built_at = 1 << 62  # suppress router rebuilds
    t0 = time.time()
    idx.add(x)
    build_s = time.time() - t0
    print(
        f"# build: {N / build_s:.0f} vec/s ({build_s:.0f}s) "
        f"route_k={idx.cfg.route_k}",
        flush=True,
    )

    # ground truth via exact scan of the same bank
    qp = dist_mod.preprocess(jnp.asarray(queries), "cosine").astype(
        idx.cfg.compute_dtype
    )
    state = idx.state
    _, exact_ids = bruteforce.search(
        qp,
        state.vectors,
        state.valid,
        "cosine",
        K,
        scales=state.scales if idx.cfg.quantized else None,
        approx=False,
    )
    exact = np.asarray(exact_ids)

    @jax.jit
    def _combine(*xs):
        return sum(v[0, 0].astype(jnp.float32) for v in xs)

    def timed(fn, reps=8, blocks=3):
        outs = [fn(r) for r in range(reps)]
        float(np.asarray(_combine(*[o[0] for o in outs])))
        best = float("inf")
        for _ in range(blocks):
            t0 = time.time()
            outs = [fn(r) for r in range(reps)]
            float(np.asarray(_combine(*[o[0] for o in outs])))
            best = min(best, (time.time() - t0) / reps)
        return Q / best

    qdev_vars = [jnp.roll(jnp.asarray(queries), r, axis=0) for r in range(8)]

    # exact-scan reference point
    scan_qps = timed(
        lambda r: bruteforce.search(
            jnp.roll(qp, r, axis=0),
            state.vectors,
            state.valid,
            "cosine",
            K,
            scales=state.scales if idx.cfg.quantized else None,
        )
    )
    print(f"# scan: qps={scan_qps:.0f}", flush=True)

    for knobs in EF_LADDER:
        cfg = dataclasses.replace(idx.cfg, **knobs)
        d_, i_ = search_mod.search(idx.state, qdev_vars[0], cfg, K)
        jax.block_until_ready((d_, i_))
        rec = recall_of(np.asarray(i_), exact)
        qps = timed(lambda r: search_mod.search(idx.state, qdev_vars[r], cfg, K))
        print(
            f"# graph ef={knobs['ef_search']} iters={knobs['iters']}: "
            f"recall@10={rec:.3f} qps={qps:.0f}",
            flush=True,
        )


if __name__ == "__main__":
    main_ivf() if IVF else main()
