"""Property-style fuzz: random op sequences keep index ≡ oracle.

The reference had no property tests (SURVEY §4 'notably absent').  This
drives the single-device SlotIndex AND the 8-device ShardedSlotIndex
through randomized interleavings of add / remove / compact and checks,
after every step, that (a) the live count matches a host-side model,
(b) search results come only from live rows, and (c) the exact backend
agrees on the top hit for in-distribution probes.  The single-device run
is sized to cross capacity-growth boundaries (round-1 fuzz never grew);
a third test races queries against mutations through the real actor.
"""

import asyncio

import numpy as np
import pytest

from vector_store_tpu.core import SlotIndex
from vector_store_tpu.types import IndexParams

pytestmark = pytest.mark.slow


def _drive(
    idx,
    steps: int,
    seed: int,
    d: int,
    max_add: int,
    decode=int,
    strict_top1: bool = True,
    model: dict | None = None,
    reload_fn=None,
):
    """Shared fuzz loop: returns (model, remap_count, idx).  `idx` needs
    add/remove/search/count and optionally compact/exact_search.
    `strict_top1=False` relaxes the approximate-search self-lookup for
    probe-bounded backends (IVF after clustering); the exact oracle
    still asserts top-1.  `model` seeds the oracle with rows already in
    the index (they churn like any other).  `reload_fn(idx) -> idx`
    (save→load roundtrip) is mixed into the op stream when given — ids
    must survive persistence and the restored index must keep churning;
    callers must use the RETURNED idx afterwards."""
    rng = np.random.default_rng(seed)
    if model is None:
        model = {}  # id -> vector (live rows)
    remap_total = 0
    has_compact = hasattr(idx, "compact")

    ops = ["add", "remove", "compact", "reload"]
    probs = [0.55, 0.3, 0.09, 0.06] if reload_fn else [0.6, 0.3, 0.1, 0.0]
    for step in range(steps):
        op = rng.choice(ops, p=probs)
        if op == "reload":
            idx = reload_fn(idx)
            assert idx.count() == len(model), f"step {step} (reload)"
        elif op == "add" or not model:
            n = int(rng.integers(1, max_add))
            vecs = rng.normal(size=(n, d)).astype(np.float32)
            ids = idx.add(vecs)
            for s, v in zip(ids, vecs):
                model[decode(s)] = v
        elif op == "remove":
            kill = rng.choice(
                list(model), size=min(7, len(model)), replace=False
            )
            kill = np.asarray(kill, dtype=np.int64)
            if rng.random() < 0.3 and len(kill):
                # adversarial: duplicate + never-issued ids in the batch
                kill = np.concatenate([kill, kill[:1], [10**7 + step]])
            idx.remove(kill)
            for s in set(kill.tolist()):
                model.pop(int(s), None)
        elif has_compact:
            remap = idx.compact()
            if remap:  # ivf-style backends return {} (stable ids)
                model = {
                    remap[s]: v for s, v in model.items() if s in remap
                }
            remap_total += 1

        assert idx.count() == len(model), f"step {step} ({op})"

        if model and step % 4 == 0:
            # probe a random live vector: its own id must tie the best
            # distance, and no dead id may ever surface.  Tie-tolerant on
            # purpose: two live rows CAN hold bit-identical vectors (a
            # soak run that seeds the bank and the churn stream from the
            # same rng seed re-draws the same gaussians), and either of a
            # distance-0 pair may legitimately sort first.
            probe_id = int(rng.choice(list(model)))
            q = model[probe_id]
            k = min(5, len(model))
            d_g, ids_g = idx.search(q, k)
            d_g = np.atleast_2d(np.asarray(d_g))[0]
            ids_g = np.atleast_2d(ids_g)[0]
            if strict_top1:
                assert _self_hit(ids_g, d_g, probe_id), f"step {step}"
            for s in ids_g:
                assert s == -1 or int(s) in model, (
                    f"step {step}: dead/unknown id {s} returned"
                )
            if hasattr(idx, "exact_search"):
                d_e, ids_e = idx.exact_search(q, k)
                d_e = np.atleast_2d(np.asarray(d_e))[0]
                ids_e = np.atleast_2d(ids_e)[0]
                assert _self_hit(ids_e, d_e, probe_id), (
                    f"step {step}: exact oracle {ids_e.tolist()}"
                )
    return model, remap_total, idx


def _self_hit(ids: np.ndarray, dists: np.ndarray, probe_id: int) -> bool:
    """True iff probe_id is in the results with a distance tying the best."""
    pos = np.flatnonzero(ids == probe_id)
    return pos.size > 0 and dists[pos[0]] <= dists[0] + 1e-5


@pytest.mark.parametrize("seed", [1, 7])
def test_random_ops_match_model(seed, tmp_path):
    """120 steps over a SMALL initial capacity: the run crosses several
    capacity doublings (round-1 weak #7: 12 steps, no growth, caught
    nothing because it couldn't).  Random save→load roundtrips are in
    the op mix: ids and contents must survive persistence mid-churn."""
    from vector_store_tpu.core import persist

    d = 12
    idx = SlotIndex(
        IndexParams(dimensions=d, space="l2"), initial_capacity=512
    )
    start_cap = idx.capacity

    def reload(ix):
        path = str(tmp_path / "snap.npz")
        persist.save(path, ix)
        restored, _ = persist.load(path)
        return restored

    model, remaps, idx = _drive(
        idx, steps=120, seed=seed, d=d, max_add=64, reload_fn=reload
    )
    assert idx.capacity > start_cap, "fuzz never crossed a growth boundary"
    assert idx.count() == len(model)


def test_random_ops_sharded():
    """The same model-oracle loop against the 8-device mesh backend —
    double-removes, unknown gids, compaction remaps and growth all
    included (round-1 fuzz never touched the sharded path)."""
    from vector_store_tpu.shard.sharded_index import ShardedSlotIndex

    d = 12
    idx = ShardedSlotIndex(
        IndexParams(dimensions=d, space="l2"),
        n_devices=8,
        initial_capacity_per_shard=512,
    )
    model, remaps, idx = _drive(idx, steps=36, seed=5, d=d, max_add=96)
    assert idx.count() == len(model)
    assert remaps > 0, "fuzz never exercised sharded compact"


def test_random_ops_ivf(tmp_path):
    """The IVF backend under the model-oracle loop.  A deterministic
    bulk add first crosses the staging→clustered threshold VIA THE ADD
    PATH (a random-compact crossing would certify nothing — it
    reclusters unconditionally), then the randomized churn runs against
    the clustered bank: placement, free-list slot reuse, doubling
    reclusters, and mid-churn save→load roundtrips.  (Single-add staging
    growth has its own dedicated test:
    test_ivf.py::test_staging_add_survives_bucket_growth.)"""
    from vector_store_tpu.core.ivf import IvfIndex

    d = 12
    idx = IvfIndex(
        IndexParams(dimensions=d, space="l2"), cluster_min=600, probes=64
    )

    def reload(ix):
        path = str(tmp_path / "ivf.npz")
        ix.save(path)
        return IvfIndex.load(path)
    rng = np.random.default_rng(99)
    seed_vecs = rng.normal(size=(700, d)).astype(np.float32)
    ids = idx.add(seed_vecs)
    assert idx._clustered, "bulk add must cross cluster_min via add()"
    seeded = {int(s): v for s, v in zip(ids, seed_vecs)}
    model, _, idx = _drive(
        idx,
        steps=60,
        seed=13,
        d=d,
        max_add=64,
        strict_top1=False,
        model=seeded,
        reload_fn=reload,
    )
    assert idx.count() == len(model)


def test_random_ops_ivf_sharded():
    """Same loop against the 8-device sharded IVF (newest backend):
    add-path recluster crossing, per-shard placement, free-list reuse
    under churn, and stable gids across compact, all under randomized
    interleavings."""
    from vector_store_tpu.shard.sharded_ivf import ShardedIvfIndex

    d = 12
    idx = ShardedIvfIndex(
        IndexParams(dimensions=d, space="l2"),
        n_devices=8,
        cluster_min=600,
        probes=64,
    )
    rng = np.random.default_rng(98)
    seed_vecs = rng.normal(size=(700, d)).astype(np.float32)
    ids = idx.add(seed_vecs)
    assert idx._clustered, "bulk add must cross cluster_min via add()"
    seeded = {int(s): v for s, v in zip(ids, seed_vecs)}
    model, _, idx = _drive(
        idx,
        steps=30,
        seed=11,
        d=d,
        max_add=96,
        strict_top1=False,
        model=seeded,
    )
    assert idx.count() == len(model)


@pytest.mark.asyncio
async def test_concurrent_query_during_mutate():
    """Queries racing a mutation storm through the real actor: every
    reply resolves, every returned key was bound at some point, and the
    final count converges to the model (actor-loop coalescing + the
    micro-batcher run concurrently here)."""
    from vector_store_tpu.engine.actor import spawn_index_actor
    from vector_store_tpu.engine.ann_index import AnnIndexBackend
    from vector_store_tpu.types import IndexId, Limit

    d = 16
    backend = AnnIndexBackend(
        IndexId("ks.fuzz"),
        IndexParams(dimensions=d, space="l2"),
        window_s=0.001,
    )
    actor = spawn_index_actor(backend, name="ks.fuzz")
    rng = np.random.default_rng(9)
    vecs = rng.normal(size=(256, d)).astype(np.float32)
    ever_added: set = set()
    live: set = set()

    async def mutate() -> None:
        for i in range(256):
            await actor.add_or_replace((i,), vecs[i])
            ever_added.add((i,))
            live.add((i,))
            if i % 5 == 4:
                victim = (i - 2,)
                await actor.remove(victim)
                live.discard(victim)
            if i % 16 == 0:
                await asyncio.sleep(0)  # let queries interleave

    async def query() -> list:
        results = []
        for j in range(96):
            qi = int(rng.integers(0, 256))
            try:
                keys, dists = await actor.ann(vecs[qi], Limit(3))
            except Exception as exc:  # noqa: BLE001
                raise AssertionError(f"query {j} raised: {exc}") from exc
            assert len(keys) == len(dists)
            results.append(keys)
            await asyncio.sleep(0)
        return results

    mt = asyncio.create_task(mutate())
    all_results = await asyncio.gather(query(), query())
    await mt
    for results in all_results:
        for keys in results:
            for key in keys:
                assert key in ever_added, f"unknown key {key} surfaced"

    async with asyncio.timeout(60):
        while await actor.count() != len(live):
            await asyncio.sleep(0)
    actor.close()
    await actor.join()
