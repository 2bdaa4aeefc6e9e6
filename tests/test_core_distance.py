"""Distance/top-k kernel unit tests against numpy oracles."""

import jax.numpy as jnp
import numpy as np

from vector_store_tpu.core import bruteforce, distance, topk


def _np_pairwise(q, x, space):
    if space == "dot":
        return -q @ x.T
    if space == "cosine":
        qn = q / np.linalg.norm(q, axis=-1, keepdims=True)
        xn = x / np.linalg.norm(x, axis=-1, keepdims=True)
        return 1.0 - qn @ xn.T
    d = q[:, None, :] - x[None, :, :]
    return np.sum(d * d, axis=-1)


def test_pairwise_matches_numpy(rng):
    q = rng.normal(size=(7, 33)).astype(np.float32)
    x = rng.normal(size=(19, 33)).astype(np.float32)
    for space in ("l2", "dot"):
        # l2-via-matmul identity carries ~1e-3 relative cancellation error
        got = np.asarray(distance.pairwise(jnp.asarray(q), jnp.asarray(x), space))
        np.testing.assert_allclose(got, _np_pairwise(q, x, space), rtol=3e-3, atol=1e-3)
    # cosine: bank/queries pre-normalised by convention
    qn = np.asarray(distance.preprocess(jnp.asarray(q), "cosine"))
    xn = np.asarray(distance.preprocess(jnp.asarray(x), "cosine"))
    got = np.asarray(distance.pairwise(jnp.asarray(qn), jnp.asarray(xn), "cosine"))
    np.testing.assert_allclose(got, _np_pairwise(q, x, "cosine"), rtol=1e-4, atol=1e-4)


def test_gathered_matches_pairwise(rng):
    q = rng.normal(size=(5, 16)).astype(np.float32)
    x = rng.normal(size=(40, 16)).astype(np.float32)
    ids = rng.integers(0, 40, size=(5, 9))
    cand = x[ids]
    got = np.asarray(distance.gathered(jnp.asarray(q), jnp.asarray(cand), "l2"))
    want = np.stack([_np_pairwise(q[i : i + 1], cand[i], "l2")[0] for i in range(5)])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_dedup_by_id():
    ids = jnp.asarray([[3, 1, 3, 2, 1, 9]], dtype=jnp.int32)
    dist = jnp.asarray([[0.3, 0.1, 0.2, 0.4, 0.5, 0.9]], dtype=jnp.float32)
    d, i = topk.dedup_by_id(dist, ids)
    d, i = np.asarray(d)[0], np.asarray(i)[0]
    kept = {int(ii): float(dd) for ii, dd in zip(i, d) if ii != topk.SENTINEL}
    assert kept == {1: np.float32(0.1), 2: np.float32(0.4), 3: np.float32(0.2), 9: np.float32(0.9)}


def test_merge_pool_keeps_expanded_flag():
    pool_d = jnp.asarray([[0.1, 0.5]], dtype=jnp.float32)
    pool_i = jnp.asarray([[7, 8]], dtype=jnp.int32)
    pool_e = jnp.asarray([[True, False]])
    new_d = jnp.asarray([[0.1, 0.05]], dtype=jnp.float32)
    new_i = jnp.asarray([[7, 9]], dtype=jnp.int32)  # 7 is a duplicate
    d, i, e = topk.merge_pool(pool_d, pool_i, pool_e, new_d, new_i)
    d, i, e = np.asarray(d)[0], np.asarray(i)[0], np.asarray(e)[0]
    assert list(i) == [9, 7]
    assert list(e) == [False, True]  # duplicate 7 kept its expanded bit
    np.testing.assert_allclose(d, [0.05, 0.1])


def test_bruteforce_exact_topk(rng):
    x = rng.normal(size=(300, 24)).astype(np.float32)
    q = rng.normal(size=(11, 24)).astype(np.float32)
    valid = np.ones((300,), dtype=bool)
    valid[10:20] = False
    d, i = bruteforce.search(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(valid), "l2", 5, chunk=64
    )
    d, i = np.asarray(d), np.asarray(i)
    full = _np_pairwise(q, x, "l2")
    full[:, ~valid] = np.inf
    want = np.sort(full, axis=1)[:, :5]
    np.testing.assert_allclose(d, want, rtol=1e-4, atol=1e-4)
    assert not np.isin(i, np.arange(10, 20)).any()
