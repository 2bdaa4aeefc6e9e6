"""Property-style fuzz: random op sequences keep index ≡ oracle.

The reference had no property tests (SURVEY §4 'notably absent').  This
drives a SlotIndex through randomized interleavings of add / remove /
compact and checks, after every step, that (a) the live count matches a
host-side model, and (b) search results come only from live rows with
the exact backend agreeing on the top hit for in-distribution probes.
"""

import numpy as np
import pytest

from vector_store_tpu.core import SlotIndex
from vector_store_tpu.types import IndexParams


@pytest.mark.parametrize("seed", [1, 7])
def test_random_ops_match_model(seed):
    rng = np.random.default_rng(seed)
    d = 12
    idx = SlotIndex(
        IndexParams(dimensions=d, space="l2"), initial_capacity=2048
    )
    model: dict[int, np.ndarray] = {}  # slot -> vector (live rows)
    remap_total = 0

    for step in range(12):
        op = rng.choice(["add", "remove", "compact"], p=[0.6, 0.3, 0.1])
        if op == "add" or not model:
            n = int(rng.integers(1, 40))
            vecs = rng.normal(size=(n, d)).astype(np.float32)
            slots = idx.add(vecs)
            for s, v in zip(slots, vecs):
                model[int(s)] = v
        elif op == "remove":
            kill = rng.choice(list(model), size=min(5, len(model)), replace=False)
            idx.remove(np.asarray(kill, dtype=np.int64))
            for s in kill:
                del model[int(s)]
        else:
            remap = idx.compact()
            model = {remap[s]: v for s, v in model.items() if s in remap}
            remap_total += 1

        assert idx.count() == len(model), f"step {step} ({op})"

        if model:
            # probe a random live vector: its own slot must be top-1 on
            # both backends, and no dead slot may ever surface
            probe_slot = int(rng.choice(list(model)))
            q = model[probe_slot]
            _, ids_g = idx.search(q, min(5, len(model)))
            _, ids_e = idx.exact_search(q, min(5, len(model)))
            assert ids_e[0] == probe_slot
            assert ids_g[0] == probe_slot
            for got in (ids_g, ids_e):
                for s in got:
                    assert s == -1 or int(s) in model, (
                        f"step {step}: dead/unknown slot {s} returned"
                    )
