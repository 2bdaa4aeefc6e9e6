#!/usr/bin/env python
"""Router quality sweep at scale: probes × ef, vs flat routing.

Builds (or restores) an N×768 graph index, rebuilds the router over the
FULL bank, and sweeps route_probes/ef.  Snapshot cached in /tmp.
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
DTYPE = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
D, Q, K = 768, 2048, 10

from bench import make_dataset, recall_of  # noqa: E402

SNAP = f"/tmp/vst_snap_{N}_{DTYPE}.npz"


def main():
    import jax

    plat = os.environ.get("VST_BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    import jax.numpy as jnp

    from vector_store_tpu.core import SlotIndex, bruteforce, persist
    from vector_store_tpu.core import distance as dist_mod
    from vector_store_tpu.core import search as search_mod
    from vector_store_tpu.types import IndexParams

    x, queries = make_dataset(N, D, Q)
    if os.path.exists(SNAP):
        t0 = time.time()
        idx, _ = persist.load(SNAP)
        print(f"# restored snapshot in {time.time()-t0:.0f}s", flush=True)
    else:
        cap = max(1 << 16, 1 << (N - 1).bit_length())
        idx = SlotIndex(
            IndexParams(dimensions=D, space="cosine", capacity=N, dtype=DTYPE),
            initial_capacity=cap,
            insert_block=1024,
        )
        t0 = time.time()
        idx.add(x)
        print(f"# build: {N/(time.time()-t0):.0f} vec/s", flush=True)
        t0 = time.time()
        persist.save(SNAP, idx)
        print(f"# snapshot saved in {time.time()-t0:.0f}s", flush=True)

    # full-bank router rebuild (tail-of-bulk-load policy under test)
    t0 = time.time()
    idx.rebuild_router()
    print(
        f"# router rebuilt at {idx.frontier}: K={idx.cfg.route_k} "
        f"({time.time()-t0:.0f}s)",
        flush=True,
    )

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

    qv = [jnp.roll(jnp.asarray(queries), r, axis=0) for r in range(8)]

    grid = [
        dict(route_probes=8, ef_search=48, iters=10, beam_width=6),
        dict(route_probes=16, ef_search=48, iters=10, beam_width=6),
        dict(route_probes=32, ef_search=48, iters=10, beam_width=6),
        dict(route_probes=16, ef_search=48, iters=6, beam_width=6),
        dict(route_probes=32, ef_search=48, iters=6, beam_width=6),
        dict(route_probes=32, ef_search=64, iters=8, beam_width=8),
        dict(route_probes=16, ef_search=96, iters=16, beam_width=8),
        dict(route_k=0, ef_search=48, iters=10, beam_width=6),  # flat ref
    ]
    for knobs in grid:
        cfg = dataclasses.replace(idx.cfg, **knobs)
        d_, i_ = search_mod.search(idx.state, qv[0], cfg, K)
        jax.block_until_ready((d_, i_))
        rec = recall_of(np.asarray(i_), exact)
        qps = timed(lambda r: search_mod.search(idx.state, qv[r], cfg, K))
        print(
            f"# {knobs}: recall@10={rec:.3f} qps={qps:.0f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
