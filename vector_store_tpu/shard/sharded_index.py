"""Multi-chip sharded ANN index — documents sharded, top-k merged over ICI.

The scaling story the reference never had (single-node CPU service): the
graph index shards by document across a `jax.sharding.Mesh`.  Each device
owns an independent GraphState shard; a query batch is replicated, every
shard runs the same batched beam search locally, and the per-shard top-k
results meet in an `all_gather` + merge — one collective on the critical
path, riding ICI (SURVEY §2 parallelism checklist; BASELINE config 5).

Layout: every state array gains a leading shard axis —
vectors[S, C, D], neighbors[S, C, R], ... — sharded on axis 0 with
`NamedSharding(mesh, P("shard"))`, so XLA places one [C, ...] block per
device and `shard_map` hands each device its local block.

Global ids: `gid = slot * S + shard` (S = shard count, fixed for the
index lifetime) — deliberately capacity-INDEPENDENT, so ids issued
before a capacity-doubling growth stay valid after it.  With balanced
round-robin routing this also makes gid equal the global insertion
order.
"""

from __future__ import annotations

import functools
import threading

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.6 exports shard_map at top level
    from jax import shard_map as _shard_map_fn
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_fn

from ..core import build, graph
from ..core import search as search_mod
from ..core.graph import GraphConfig, GraphState
from ..core.index import INSERT_BLOCK, _bucket, config_from_params
from ..core.topk import SENTINEL, topk_ascending
from ..types import IndexParams
from .mesh import SHARD_AXIS, make_mesh

INVALID = graph.INVALID


def _stack_init(cfg: GraphConfig, n_shards: int, capacity: int, mesh: Mesh) -> GraphState:
    """Fresh stacked state [S, ...] placed shard-per-device."""
    sh = NamedSharding(mesh, P(SHARD_AXIS))
    mk = lambda shape, dtype, fill: jax.device_put(
        jnp.full(shape, fill, dtype=dtype), sh
    )
    rk, rbm = graph.router_shapes(cfg)
    return GraphState(
        vectors=mk((n_shards, capacity, cfg.dims), cfg.jdtype, 0),
        scales=mk((n_shards, capacity), jnp.float32, 1.0),
        neighbors=mk((n_shards, capacity, cfg.degree), jnp.int32, INVALID),
        nbr_dist=mk((n_shards, capacity, cfg.degree), jnp.float32, jnp.inf),
        valid=mk((n_shards, capacity), bool, False),
        size=mk((n_shards,), jnp.int32, 0),
        frontier=mk((n_shards,), jnp.int32, 0),
        route_centroids=mk((n_shards, rk, cfg.dims), cfg.compute_dtype, 0),
        route_members=mk((n_shards, rk, rbm), jnp.int32, graph.SENTINEL),
        route_cnt=mk((n_shards, rk), jnp.int32, 0),
    )


def _local(state: GraphState) -> GraphState:
    """Strip the leading (local, size-1) shard axis inside shard_map."""
    return GraphState(*(a[0] for a in state))


def _relocal(state: GraphState) -> GraphState:
    return GraphState(*(a[None] for a in state))


@functools.partial(
    jax.jit, static_argnames=("cfg", "k", "mesh_holder")
)
def _sharded_search(state, queries, cfg, k, mesh_holder):
    mesh = mesh_holder.mesh

    S = mesh.devices.size

    def fn(state_blk, queries_rep):
        local = _local(state_blk)
        d, i = search_mod.search_impl(local, queries_rep, cfg, k)
        shard = jax.lax.axis_index(SHARD_AXIS).astype(jnp.int32)
        # capacity-independent encoding: gid = slot * S + shard (slots are
        # clipped before the multiply so the sentinel lane cannot overflow)
        gid = jnp.where(
            i == SENTINEL,
            SENTINEL,
            jnp.clip(i, 0, local.capacity - 1) * S + shard,
        )
        # all-gather per-shard top-k over ICI, merge to global top-k
        dd = jax.lax.all_gather(d, SHARD_AXIS)  # [S, Q, k]
        ii = jax.lax.all_gather(gid, SHARD_AXIS)
        n_sh, Q, K = dd.shape
        flat_d = jnp.transpose(dd, (1, 0, 2)).reshape(Q, n_sh * K)
        flat_i = jnp.transpose(ii, (1, 0, 2)).reshape(Q, n_sh * K)
        md, pos = topk_ascending(flat_d, k)
        mi = jnp.take_along_axis(flat_i, pos, axis=-1)
        return md, mi

    return _shard_map_fn(
        fn,
        mesh=mesh,
        in_specs=(GraphState(*([P(SHARD_AXIS)] * len(GraphState._fields))), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )(state, queries)


@functools.partial(jax.jit, static_argnames=("cfg", "mesh_holder"), donate_argnums=(0,))
def _sharded_insert(state, bases, vecs, live, cfg, mesh_holder):
    """bases [S], vecs [S, M, D], live [S, M] — every shard inserts its
    sub-batch simultaneously."""
    mesh = mesh_holder.mesh

    def fn(state_blk, base_blk, vecs_blk, live_blk):
        local = _local(state_blk)
        new = build.insert_impl(
            local, base_blk[0], vecs_blk[0], live_blk[0], cfg
        )
        return _relocal(new)

    return _shard_map_fn(
        fn,
        mesh=mesh,
        in_specs=(
            GraphState(*([P(SHARD_AXIS)] * len(GraphState._fields))),
            P(SHARD_AXIS),
            P(SHARD_AXIS),
            P(SHARD_AXIS),
        ),
        out_specs=GraphState(*([P(SHARD_AXIS)] * len(GraphState._fields))),
        check_vma=False,
    )(state, bases, vecs, live)


@functools.partial(jax.jit, static_argnames=("mesh_holder",), donate_argnums=(0,))
def _sharded_delete(state, slots, live, mesh_holder):
    """slots [S, m] local slot ids, live [S, m]."""
    mesh = mesh_holder.mesh

    def fn(state_blk, slots_blk, live_blk):
        local = _local(state_blk)
        new = build.delete_impl(local, slots_blk[0], live_blk[0])
        return _relocal(new)

    return _shard_map_fn(
        fn,
        mesh=mesh,
        in_specs=(
            GraphState(*([P(SHARD_AXIS)] * len(GraphState._fields))),
            P(SHARD_AXIS),
            P(SHARD_AXIS),
        ),
        out_specs=GraphState(*([P(SHARD_AXIS)] * len(GraphState._fields))),
        check_vma=False,
    )(state, slots, live)


class _MeshHolder:
    """Hashable wrapper so a Mesh can ride as a jit static argument."""

    def __init__(self, mesh: Mesh) -> None:
        self.mesh = mesh

    def __hash__(self) -> int:
        return hash(id(self.mesh))

    def __eq__(self, other) -> bool:
        return isinstance(other, _MeshHolder) and other.mesh is self.mesh


class ShardedSlotIndex:
    """Host wrapper mirroring SlotIndex over a device mesh.

    Ids returned by search/add are global (`slot * n_shards + shard`,
    stable across capacity growth); `decode()` splits one back into
    (shard, slot).  Vectors are routed to shards round-robin by the
    host, so shard sizes stay balanced without any device-side
    coordination.
    """

    def __init__(
        self,
        params: IndexParams,
        mesh: Mesh | None = None,
        n_devices: int | None = None,
        initial_capacity_per_shard: int | None = None,
    ) -> None:
        self.params = params
        self.mesh = mesh or make_mesh(n_devices)
        self._holder = _MeshHolder(self.mesh)
        self.n_shards = self.mesh.devices.size
        cap = initial_capacity_per_shard or max(
            min(params.capacity // self.n_shards, 1 << 16), 2 * INSERT_BLOCK
        )
        self.cfg = config_from_params(params, cap)
        self._state = _stack_init(self.cfg, self.n_shards, cap, self.mesh)
        self._frontiers = np.zeros((self.n_shards,), dtype=np.int64)
        self._sizes = np.zeros((self.n_shards,), dtype=np.int64)
        self._lock = threading.Lock()

    # -- introspection ----------------------------------------------------

    @property
    def capacity(self) -> int:
        return self._state.vectors.shape[1]

    def count(self) -> int:
        return int(self._sizes.sum())

    def decode(self, gid: int) -> tuple[int, int]:
        """gid → (shard, slot).  Encoding never involves capacity, so
        ids survive growth (the round-1 `shard * C + slot` scheme went
        stale the moment C doubled)."""
        slot, shard = divmod(int(gid), self.n_shards)
        return shard, slot

    # -- mutation ---------------------------------------------------------

    def _ensure_capacity(self, per_shard_need: int) -> None:
        cap = self.capacity
        need = int(self._frontiers.max()) + per_shard_need
        if need + INSERT_BLOCK <= cap:
            return
        new_cap = cap
        while need + INSERT_BLOCK > new_cap:
            new_cap *= 2
        pad = new_cap - cap
        s = self._state
        sh = NamedSharding(self.mesh, P(SHARD_AXIS))
        put = lambda a: jax.device_put(a, sh)
        self._state = GraphState(
            vectors=put(jnp.pad(s.vectors, ((0, 0), (0, pad), (0, 0)))),
            scales=put(jnp.pad(s.scales, ((0, 0), (0, pad)), constant_values=1.0)),
            neighbors=put(
                jnp.pad(s.neighbors, ((0, 0), (0, pad), (0, 0)), constant_values=INVALID)
            ),
            nbr_dist=put(
                jnp.pad(s.nbr_dist, ((0, 0), (0, pad), (0, 0)), constant_values=jnp.inf)
            ),
            valid=put(jnp.pad(s.valid, ((0, 0), (0, pad)))),
            size=s.size,
            frontier=s.frontier,
            route_centroids=s.route_centroids,
            route_members=s.route_members,
            route_cnt=s.route_cnt,
        )
        import dataclasses as _dc

        from ..core.index import routing_sample_for

        self.cfg = _dc.replace(
            self.cfg, routing_sample=routing_sample_for(new_cap)
        )

    def add(self, vectors: np.ndarray) -> np.ndarray:
        """Insert vectors round-robin across shards → global ids [n]."""
        vectors = np.asarray(vectors, dtype=np.float32)
        if vectors.ndim == 1:
            vectors = vectors[None, :]
        n, d = vectors.shape
        if d != self.cfg.dims:
            raise ValueError(f"dimension mismatch: index {self.cfg.dims}, got {d}")
        S = self.n_shards
        gids = np.empty((n,), dtype=np.int64)
        with self._lock:
            done = 0
            while done < n:
                take = min(n - done, S * INSERT_BLOCK)
                chunk = vectors[done : done + take]
                # round-robin deal into S sub-batches
                per = [chunk[s::S] for s in range(S)]
                m = max(len(p) for p in per)
                self._ensure_capacity(m)
                vecs = np.zeros((S, INSERT_BLOCK, d), dtype=np.float32)
                live = np.zeros((S, INSERT_BLOCK), dtype=bool)
                bases = self._frontiers.astype(np.int32)
                for s, p in enumerate(per):
                    vecs[s, : len(p)] = p
                    live[s, : len(p)] = True
                    gids[done + s : done + take : S] = (
                        bases[s] + np.arange(len(p))
                    ) * np.int64(S) + s
                self._state = _sharded_insert(
                    self._state,
                    jnp.asarray(bases),
                    jnp.asarray(vecs),
                    jnp.asarray(live),
                    self.cfg,
                    self._holder,
                )
                for s, p in enumerate(per):
                    self._frontiers[s] += len(p)
                    self._sizes[s] += len(p)
                done += take
        return gids

    def remove(self, gids: np.ndarray) -> None:
        # dedup: a slot repeated in one batch would double-decrement the
        # device size counter (every lane reads pre-update validity)
        gids = np.unique(np.asarray(gids, dtype=np.int64).reshape(-1))
        if gids.size == 0:
            return
        with self._lock:
            S = self.n_shards
            slot, shard = np.divmod(gids, S)
            m = max(int(np.bincount(shard, minlength=S).max()), 1)
            m = _bucket(m)
            slots = np.zeros((S, m), dtype=np.int32)
            live = np.zeros((S, m), dtype=bool)
            for s in range(S):
                mine = slot[shard == s]
                slots[s, : len(mine)] = mine
                live[s, : len(mine)] = True
            self._state = _sharded_delete(
                self._state, jnp.asarray(slots), jnp.asarray(live), self._holder
            )
            # host count mirrors device truth: delete_impl only decrements
            # for rows that were actually live, so read the result back
            # instead of guessing (unknown / already-removed gids would
            # otherwise desync count() permanently)
            self._sizes = np.asarray(
                jax.device_get(self._state.size), dtype=np.int64
            )

    # -- query ------------------------------------------------------------

    def search(self, queries: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
        queries = np.asarray(queries, dtype=np.float32)
        single = queries.ndim == 1
        if single:
            queries = queries[None, :]
        n, d = queries.shape
        if d != self.cfg.dims:
            raise ValueError(f"dimension mismatch: index {self.cfg.dims}, got {d}")
        b = _bucket(n)
        if b != n:
            queries = np.pad(queries, ((0, b - n), (0, 0)))
        with self._lock:
            qp = jnp.asarray(queries)
            # match single-device path: preprocess handled inside search_impl
            dist, ids = _sharded_search(self._state, qp, self.cfg, k, self._holder)
            dist = np.asarray(dist[:n])
            ids = np.asarray(ids[:n]).astype(np.int64)
        ids[~np.isfinite(dist)] = -1
        if single:
            return dist[0], ids[0]
        return dist, ids
