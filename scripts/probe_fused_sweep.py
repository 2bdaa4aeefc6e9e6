#!/usr/bin/env python
"""Sweep the fused probe-scan kernel's (qg, nbuf) on the real chip.

qg = queries per grid step, nbuf = DMA ring depth.  Finds the fastest
geometry for the headline dispatch shape (1024 queries, probes=4,
k=10, int8 1M x 768).  Usage:
    python scripts/probe_fused_sweep.py [N] [probes...]
Caches the built index in /tmp so re-runs skip the build.
`--rpb N` sets the rows-per-bucket geometry target (default 170):
bigger buckets → larger DMA blocks → higher effective HBM bandwidth,
at fewer/coarser probes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RPB = 170
QOVR = None  # --q N: queries per dispatch (default 1024)
NO_ORACLE = False  # --no-oracle: skip the exact-search recall check
LIVE_PREFIX = None  # None = sweep both; 0/1 pins one mode
SCORE = "f32"  # f32 | qi8 (int8 MXU dot) | stub (DMA-floor ablation)
GEO = None  # --geo qg,nbuf: pin ONE geometry (the full 3x3 sweep is
#             ~9 fresh kernel compiles and does not fit a 10-minute
#             window on this tunnel; single-geometry probes do)
args = []
it = iter(sys.argv[1:])
for a in it:
    if a == "--rpb":
        RPB = int(next(it))
    elif a == "--live-prefix":
        LIVE_PREFIX = int(next(it))
    elif a == "--score":
        SCORE = next(it)
    elif a == "--q":
        QOVR = int(next(it))
    elif a == "--no-oracle":
        NO_ORACLE = True
    elif a == "--geo":
        GEO = tuple(int(v) for v in next(it).split(","))
        if len(GEO) != 2:
            raise SystemExit("usage: --geo K,B (e.g. --geo 2816,640)")
    else:
        args.append(a)
N = int(args[0]) if args else 1_000_000
PROBES = [int(a) for a in args[1:]] or [4]
D, Q, K = 768, (QOVR or 1024), 10

from bench import make_dataset, recall_of  # noqa: E402


def main():
    import jax

    plat = os.environ.get("VST_BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    import jax.numpy as jnp

    from vector_store_tpu.core.ivf import IvfIndex
    from vector_store_tpu.core.ivf_pallas import search_clustered_fused
    from vector_store_tpu.types import IndexParams

    print(f"# devices: {jax.devices()}", flush=True)
    x, queries = make_dataset(N, D, 2048)
    queries = queries[:Q]
    snap = f"/tmp/vst_ivf_{N}_int8_rpb{RPB}.npz"
    idx = None
    if os.path.exists(snap):
        t0 = time.time()
        try:
            idx = IvfIndex.load(snap)
            print(f"# restored in {time.time() - t0:.0f}s "
                  f"clusters={idx.n_clusters} bucket={idx.state.bucket}",
                  flush=True)
        except Exception as e:  # truncated by a mid-save kill — rebuild
            print(f"# stale snapshot ({type(e).__name__}), rebuilding",
                  flush=True)
            os.unlink(snap)
    if idx is None:
        idx = IvfIndex(
            IndexParams(dimensions=D, space="cosine", dtype="int8"),
            initial_capacity=N,
            rows_per_bucket=RPB,
        )
        t0 = time.time()
        idx.add(x)
        print(f"# build: {N / (time.time() - t0):.0f} vec/s "
              f"clusters={idx.n_clusters} bucket={idx.state.bucket}", flush=True)
        idx.save(snap)
    if NO_ORACLE:
        exact = np.full((Q, K), -1, np.int64)  # recall prints ~0; timing only
    else:
        _, exact = idx.exact_search(queries, K)
    st = idx.state
    B = int(st.bucket)
    qdev = [jnp.asarray(np.roll(queries, r, axis=0)) for r in range(8)]

    # link roundtrip (the one sync fetch per timing block) — subtracted,
    # matching bench.py's DeviceTimer methodology
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

    lp_modes = (False, True) if LIVE_PREFIX is None else (bool(LIVE_PREFIX),)
    for p in PROBES:
        base_r = None
        for lp in lp_modes:
            for qg in ((GEO[0],) if GEO else (8, 16, 32)):
                for nbuf in ((GEO[1],) if GEO else (2, 4, 8)):
                    # VMEM: nbuf*B*D bytes (int8) + qg*p*B*4
                    vmem = nbuf * B * D + qg * p * B * 4
                    if vmem > 12 * 2**20:
                        print(f"#  qg={qg} nbuf={nbuf}: skip (vmem "
                              f"{vmem>>20}MB)", flush=True)
                        continue
                    try:
                        d_, i_ = search_clustered_fused(
                            st, qdev[0], "cosine", K, p, qg=qg, nbuf=nbuf,
                            live_prefix=lp, score=SCORE,
                        )
                        jax.block_until_ready(i_)
                        r = recall_of(np.asarray(i_), exact)
                        if base_r is None:
                            base_r = r
                        elif abs(r - base_r) > 0.005:
                            print(f"#  p={p} lp={int(lp)} qg={qg} "
                                  f"nbuf={nbuf}: RECALL DRIFT {r:.3f} "
                                  f"vs {base_r:.3f}", flush=True)
                        best = float("inf")
                        for _ in range(3):
                            t0 = time.time()
                            outs = [
                                search_clustered_fused(
                                    st, qdev[r_], "cosine", K, p, qg=qg,
                                    nbuf=nbuf, live_prefix=lp, score=SCORE,
                                )[0]
                                for r_ in range(8)
                            ]
                            float(np.asarray(fetch(outs[-1])))
                            elapsed = time.time() - t0
                            best = min(
                                best, max(elapsed - rt, 0.2 * elapsed) / 8
                            )
                        qps = Q / best
                        gbs = Q * p * B * D / best / 1e9
                        print(f"#  p={p} lp={int(lp)} qg={qg} nbuf={nbuf}: "
                              f"qps={qps:.0f} dma={gbs:.0f}GB/s (padded-width "
                              f"bytes)", flush=True)
                    except Exception as e:  # noqa: BLE001
                        print(f"#  p={p} lp={int(lp)} qg={qg} nbuf={nbuf}: "
                              f"FAIL {type(e).__name__}: {str(e)[:120]}",
                              flush=True)
        print(f"# p={p} recall@10={base_r:.3f} (score={SCORE})", flush=True)


if __name__ == "__main__":
    main()
