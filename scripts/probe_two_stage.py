#!/usr/bin/env python
"""On-chip probe of the two-stage IVF scan (int4 coarse + int8 rescore).

Measures, on the real chip at the headline shape (1M x 768 int8):
  1. full two-stage QPS + recall over (probes, cand) — is the int4
     coarse stream + rescore actually faster than the int8 fused scan
     at equal recall?
  2. stage split: route+coarse-pool only vs full two-stage — how much
     the rescore row-gather costs (it is descriptor-rate-bound; if it
     eats the int4 savings, shrink cand).
Usage: python scripts/probe_two_stage.py [N] [--rpb N]
Reuses /tmp snapshots from probe_fused_sweep.py when present.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RPB = 170
CLUSTER_MIN = None
args = []
it = iter(sys.argv[1:])
for a in it:
    if a == "--rpb":
        RPB = int(next(it))
    elif a == "--cluster-min":
        CLUSTER_MIN = int(next(it))
    else:
        args.append(a)
N = int(args[0]) if args else 1_000_000
D, Q, K = 768, 1024, 10
if os.environ.get("VST_PROBE_SMOKE") == "1":  # tiny CPU syntax smoke
    Q = 32
# CPU smoke: VST_PROBE_INTERPRET=1 runs the kernels under the mosaic
# interpreter (and VST_BENCH_PLATFORM=cpu flips the backend in bench)
INTERP = os.environ.get("VST_PROBE_INTERPRET") == "1"

from bench import make_dataset, recall_of  # noqa: E402


def main():
    import jax

    # VST_BENCH_PLATFORM=cpu must flip the backend BEFORE any device
    # query — the sitecustomize-registered tunnel plugin otherwise wins
    # (and a wedged tunnel hangs the smoke instead of failing fast)
    plat = os.environ.get("VST_BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    import jax.numpy as jnp

    from vector_store_tpu.core.ivf import (
        IvfIndex,
        _route,
        derive_coarse,
        search_two_stage,
    )
    from vector_store_tpu.core.ivf_pallas import pool_scan_fused
    from vector_store_tpu.core.topk import SENTINEL, topk_ascending
    from vector_store_tpu.types import IndexParams

    print(f"# devices: {jax.devices()}", flush=True)
    x, queries = make_dataset(N, D, 2048)
    queries = queries[:Q]
    snap = f"/tmp/vst_ivf_{N}_int8_rpb{RPB}.npz"
    if os.path.exists(snap):
        t0 = time.time()
        idx = IvfIndex.load(snap)
        print(f"# restored in {time.time() - t0:.0f}s "
              f"clusters={idx.n_clusters} bucket={idx.state.bucket}",
              flush=True)
    else:
        kw = {"cluster_min": CLUSTER_MIN} if CLUSTER_MIN else {}
        idx = IvfIndex(
            IndexParams(dimensions=D, space="cosine", dtype="int8"),
            initial_capacity=N,
            rows_per_bucket=RPB,
            **kw,
        )
        t0 = time.time()
        idx.add(x)
        print(f"# build: {N / (time.time() - t0):.0f} vec/s "
              f"clusters={idx.n_clusters} bucket={idx.state.bucket}",
              flush=True)
        idx.save(snap)
    _, exact = idx.exact_search(queries, K)
    st = idx.state
    B = int(st.bucket)
    t0 = time.time()
    coarse = derive_coarse(st.vectors)
    jax.block_until_ready(coarse)
    print(f"# coarse derive: {time.time() - t0:.1f}s "
          f"({coarse.nbytes >> 20}MB)", flush=True)
    qdev = [jnp.asarray(np.roll(queries, r, axis=0)) for r in range(8)]

    z = jnp.zeros((1, 1), jnp.float32)
    fetch = jax.jit(lambda a: a[0, 0])
    for _ in range(2):
        float(np.asarray(fetch(z)))
    rt = min(
        (lambda t0: (float(np.asarray(fetch(z))), time.time() - t0)[1])(
            time.time()
        )
        for _ in range(5)
    )
    print(f"# link roundtrip: {rt * 1e3:.1f}ms", flush=True)

    def timeit(fn, reps=8, blocks=3):
        fn(0)
        best = float("inf")
        for _ in range(blocks):
            t0 = time.time()
            outs = [fn(r) for r in range(reps)]
            float(np.asarray(fetch(outs[-1])))
            elapsed = time.time() - t0
            best = min(best, max(elapsed - rt, 0.2 * elapsed) / reps)
        return best

    # coarse-stage-only step (route + packed pool + top-cand, no rescore)
    @functools.partial(
        jax.jit, static_argnames=("space", "probes", "cand")
    )
    def coarse_only(state, coarse, qs, space, probes, cand):
        q, cids, p = _route(state, qs, space, probes)
        rid_masked = jnp.where(state.valid, state.rowid, SENTINEL)
        pool = pool_scan_fused(
            coarse, state.scales, rid_masked, q.astype(jnp.float32),
            cids, space, p, quantized=True, packed=True, interpret=INTERP,
        )
        bd, _ = topk_ascending(pool, cand)
        return bd

    sweep_p = (2, 3, 4, 6, 8)
    sweep_c = (48, 80, 128)
    if os.environ.get("VST_PROBE_SMOKE") == "1":
        sweep_p, sweep_c = (2,), (48,)
    for probes in sweep_p:
        for cand in sweep_c:
            try:
                d_, i_ = search_two_stage(
                    st, coarse, qdev[0], "cosine", K, probes, cand,
                    fused=True, interpret=INTERP,
                )
                jax.block_until_ready(i_)
                rec = recall_of(np.asarray(i_), exact)
                t_full = timeit(
                    lambda r: search_two_stage(
                        st, coarse, qdev[r % 8], "cosine", K, probes,
                        cand, fused=True, interpret=INTERP,
                    )[0]
                )
                t_coarse = timeit(
                    lambda r: coarse_only(
                        st, coarse, qdev[r % 8], "cosine", probes, cand
                    )
                )
                gbs = Q * probes * B * (D // 2) / t_coarse / 1e9
                print(
                    f"#  p={probes} cand={cand}: recall@10={rec:.3f} "
                    f"qps={Q / t_full:.0f} coarse-only={Q / t_coarse:.0f} "
                    f"(dma={gbs:.0f}GB/s, rescore "
                    f"{(t_full - t_coarse) * 1e3:.2f}ms/{Q}q)",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001
                print(f"#  p={probes} cand={cand}: FAIL "
                      f"{type(e).__name__}: {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
