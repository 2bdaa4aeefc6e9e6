#!/usr/bin/env python
"""Ingest-pipeline soak: the CDC churn convergence check from
tests/test_ingest.py over many fresh seeds (each round is a full
memdb -> CDC -> monitor -> actor pipeline with upserts, deletes and
stale out-of-order writes), bounded by a wall budget.

Usage: python scripts/ingest_soak.py [budget_seconds]   (default 1800)

Exits non-zero on the first convergence failure, printing the seed so
the failure replays as a pytest case.
"""

import asyncio
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
    ),
)
from test_ingest import churn_converges_once  # noqa: E402

BUDGET = float(sys.argv[1]) if len(sys.argv) > 1 else 1800.0


def main() -> None:
    t0 = time.time()
    seed = 5000
    rounds = 0
    while time.time() - t0 < BUDGET:
        t1 = time.time()
        try:
            asyncio.run(churn_converges_once(seed))
        except Exception as exc:  # noqa: BLE001
            print(f"INGEST SOAK FAIL seed={seed}: {exc!r}", flush=True)
            sys.exit(1)
        rounds += 1
        print(
            f"[{time.time() - t0:5.0f}s] ok churn seed={seed} "
            f"({time.time() - t1:.0f}s)",
            flush=True,
        )
        seed += 1
    print(f"INGEST SOAK PASS: {rounds} rounds, last seed {seed - 1}")


if __name__ == "__main__":
    main()
