"""Device-queue helpers.

On the tunneled remote-TPU backend, ``jax.block_until_ready`` returns
without waiting — only host fetches actually synchronize with the
device (measured: hundreds of queued 12MB host->device transfers
degrade the link to ~3MB/s unless the queue is drained).  Any dispatch
bound therefore has to round-trip a real value.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def drain_dispatch(x) -> None:
    """Block the host until every dispatch preceding `x` has executed,
    by fetching one scalar derived from it.  Cheap (one element over
    the link) but a true barrier on every backend, unlike
    ``jax.block_until_ready``."""
    jax.device_get(jnp.ravel(x)[:1])
