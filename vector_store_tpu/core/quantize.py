"""Int8 vector quantization — memory-parity storage mode.

The reference stores f32 in usearch (`ScalarKind::F32`,
src/index/usearch.rs:94); usearch's compressed modes (i8) are the
memory-parity target of BASELINE config 3.  Scheme: symmetric per-vector
scaling — `q = round(x / scale)`, `scale = max|x| / 127` — with the
scale kept beside the row.  Distances run asymmetric (full-precision
query against dequantised bank rows); the 4x smaller bank is what
streams from HBM, which is where the win is.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def quantize_rows(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[N, D] f32 → (values [N, D] i8, scales [N] f32)."""
    absmax = jnp.max(jnp.abs(x), axis=-1)
    scale = jnp.maximum(absmax, _EPS) / 127.0
    q = jnp.clip(jnp.round(x / scale[:, None]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def dequantize_rows(q: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """(values i8, scales) → f32; scale broadcast over the last dim."""
    return q.astype(jnp.float32) * scale[..., None]
