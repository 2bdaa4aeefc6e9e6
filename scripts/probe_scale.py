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
D, Q, K = 768, 2048, 10
SEED = 42

from bench import EF_LADDER, make_dataset, recall_of  # noqa: E402


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
    main()
