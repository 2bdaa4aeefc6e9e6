#!/usr/bin/env python
"""Extended fuzz soak: the model-oracle loop from tests/test_property_fuzz.py
over many fresh seeds, all four backends, bounded by a wall budget.

Usage: python scripts/fuzz_soak.py [budget_seconds]   (default 1800)

Exits non-zero on the first oracle violation, printing the backend and
seed so the failure can be replayed as a pytest case.
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)
from test_property_fuzz import _drive  # noqa: E402

from vector_store_tpu.core import SlotIndex  # noqa: E402
from vector_store_tpu.types import IndexParams  # noqa: E402

BUDGET = float(sys.argv[1]) if len(sys.argv) > 1 else 1800.0
T0 = time.time()
D = 12


def _tmp_reload(save, load):
    """save→load roundtrip through a temp file (mid-churn persistence)."""

    def fn(ix):
        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, "snap.npz")
            save(ix, path)
            return load(path)

    return fn


def run_slot(seed: int) -> None:
    from vector_store_tpu.core import persist

    idx = SlotIndex(IndexParams(dimensions=D, space="l2"), initial_capacity=512)
    reload_fn = _tmp_reload(
        lambda ix, p: persist.save(p, ix), lambda p: persist.load(p)[0]
    )
    model, _, idx = _drive(
        idx, steps=120, seed=seed, d=D, max_add=64, reload_fn=reload_fn
    )
    assert idx.count() == len(model)


def run_sharded(seed: int) -> None:
    from vector_store_tpu.shard.sharded_index import ShardedSlotIndex

    idx = ShardedSlotIndex(
        IndexParams(dimensions=D, space="l2"),
        n_devices=8,
        initial_capacity_per_shard=512,
    )
    reload_fn = _tmp_reload(
        lambda ix, p: ix.save(p), lambda p: ShardedSlotIndex.load(p, n_devices=8)
    )
    model, _, idx = _drive(
        idx, steps=36, seed=seed, d=D, max_add=96, reload_fn=reload_fn
    )
    assert idx.count() == len(model)


def run_ivf(seed: int) -> None:
    from vector_store_tpu.core.ivf import IvfIndex

    idx = IvfIndex(IndexParams(dimensions=D, space="l2"), cluster_min=600, probes=64)
    # bank seed disjoint from the drive seed: same-seed streams re-draw
    # bit-identical vectors, making the self-lookup oracle ambiguous
    rng = np.random.default_rng(seed + 500_000)
    seed_vecs = rng.normal(size=(700, D)).astype(np.float32)
    ids = idx.add(seed_vecs)
    seeded = {int(s): v for s, v in zip(ids, seed_vecs)}
    reload_fn = _tmp_reload(lambda ix, p: ix.save(p), IvfIndex.load)
    model, _, idx = _drive(
        idx, steps=60, seed=seed, d=D, max_add=64, strict_top1=False,
        model=seeded, reload_fn=reload_fn,
    )
    assert idx.count() == len(model)


def run_ivf_sharded(seed: int) -> None:
    from vector_store_tpu.shard.sharded_ivf import ShardedIvfIndex

    idx = ShardedIvfIndex(
        IndexParams(dimensions=D, space="l2"),
        n_devices=8,
        cluster_min=600,
        probes=64,
    )
    rng = np.random.default_rng(seed + 500_000)
    seed_vecs = rng.normal(size=(700, D)).astype(np.float32)
    ids = idx.add(seed_vecs)
    seeded = {int(s): v for s, v in zip(ids, seed_vecs)}
    reload_fn = _tmp_reload(
        lambda ix, p: ix.save(p), lambda p: ShardedIvfIndex.load(p, n_devices=8)
    )
    model, _, idx = _drive(
        idx, steps=40, seed=seed, d=D, max_add=64, strict_top1=False,
        model=seeded, reload_fn=reload_fn,
    )
    assert idx.count() == len(model)


BACKENDS = [
    ("slot", run_slot),
    ("sharded", run_sharded),
    ("ivf", run_ivf),
    ("ivf-sharded", run_ivf_sharded),
]


def main() -> None:
    rounds = 0
    seed = 1000  # disjoint from the checked-in test seeds
    while time.time() - T0 < BUDGET:
        for name, fn in BACKENDS:
            if time.time() - T0 >= BUDGET:
                break
            t = time.time()
            try:
                fn(seed)
            except Exception:
                print(f"FUZZ FAIL backend={name} seed={seed}", flush=True)
                raise
            print(
                f"[{time.time() - T0:5.0f}s] ok {name} seed={seed}"
                f" ({time.time() - t:.0f}s)",
                flush=True,
            )
            seed += 1
        rounds += 1
    print(f"SOAK PASS: {rounds} rounds, last seed {seed - 1}", flush=True)


if __name__ == "__main__":
    main()
