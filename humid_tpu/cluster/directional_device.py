"""Device formulation of DIRECTIONAL clustering (SURVEY §7 step 5).

The reference's directional method (cluster.cc:39-87) is sequential
across interacting clusters: every hill-climb and descent consults the
shared "unassigned" predicate that all earlier clusters mutated.  The
round-5 measured analysis (docs/design.md §4) showed the dependence
chains are SHORT (max 9-10 clusters per component at WGS statistics),
which makes a data-parallel formulation practical: one device ROUND
finalizes the next cluster of EVERY component simultaneously
(components never interact — the cluster_parallel_impl argument), and
the outer loop runs chain-depth rounds.

Within a round everything is bounded and order-free:

  * seed per component = min unassigned node (scatter-min) — the
    reference's "first unassigned leaf in lexicographic walk order"
    (humid.cc:177-180), because unique tables are ascending.
  * hill-climb: jump to the FIRST (= min-index: CSR neighbour lists
    ascend, matching the reference's edge-discovery order) unassigned
    neighbour with count >= 2x current, restart (cluster.cc:39-51).
    Each jump at least DOUBLES the count, so <= 31 iterations cover any
    int32 count range; each iteration is one O(E) masked scatter-min.
  * descent from the local max absorbs unassigned neighbours with
    count[cur] >= 2*count[nb] through same-cluster members only
    (cluster.cc:58-69) — a reachability closure (order-free), spread by
    masked scatters; each step at least HALVES the count, so <= 31
    sweeps.  Two maxes of one round live in different components, so
    plain scatters cannot conflict.
  * ids: a cluster's identity is its SEED node; final ids are the
    ascending rank of the seeds — exactly the reference's order (a
    cluster's seed is the smallest node no earlier cluster absorbed).

Bit-exactness is asserted against the host oracle across random and
tie-heavy graphs (tests/test_cluster.py); the route is OFF by default
(HUMID_TPU_CLUSTER=device) — the host walk is measured faster at every
reachable scale on this box (BASELINE.md), and this module exists to
close the "no device story" gap with a validated formulation rather
than to win the phase here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .exact import ClusterResult

__all__ = ["cluster_directional_device"]

#: counts double per climb jump / halve per descent step, so 31 masked
#: sweeps cover any int32 count range.
_STEP_BOUND = 31

_INF = np.int32(2**31 - 1)


@functools.partial(jax.jit, static_argnames=("u",))
def _directional_rounds(counts, comp, ea, eb, *, u: int):
    """All rounds of the per-component directional construction.

    counts [u] int32, comp [u] int32 (component = min node index),
    ea/eb [E] int32 undirected edges (both endpoint orders are derived
    here).  Returns (cluster_seed [u] — the owning cluster's seed node
    per node, max_leaf_of_seed [u] — scatter at seed positions)."""
    # Directed edge list (x -> y) with both orientations; the count
    # eligibility predicates are loop-invariant for the WHOLE call, so
    # hoist them out of every masked sweep.
    ex = jnp.concatenate([ea, eb])
    ey = jnp.concatenate([eb, ea])
    cx = counts[ex]
    cy = counts[ey]
    comp_x = comp[ex]
    grow_ok = cy >= 2 * cx      # climb:   y at least doubles x
    shrink_ok = cx >= 2 * cy    # descent: x at least doubles y

    def round_body(state):
        cluster_seed, max_leaf_at_seed, _ = state
        unassigned = cluster_seed < 0
        # Assignments do not change during the climb (step 3 is the
        # first write), so the per-edge unassigned gather is
        # round-invariant for the climb sweeps.
        unassigned_ey = unassigned[ey]

        # 1. Seed per component: min unassigned node, scattered at the
        # component's min-node slot (comp labels ARE node indices).
        seeds = jnp.full(u, _INF, jnp.int32).at[comp].min(
            jnp.where(unassigned, jnp.arange(u, dtype=jnp.int32), _INF))

        # 2. Hill-climb, all components at once.  cur[c] = current
        # climb node of component c (INF when inactive).
        def climb_body(_, cur):
            at_cur = cur[comp_x] == ex
            elig = at_cur & unassigned_ey & grow_ok
            nxt = jnp.full(u, _INF, jnp.int32).at[
                jnp.where(elig, comp_x, u)].min(
                jnp.where(elig, ey, _INF), mode="drop")
            return jnp.where(nxt < _INF, nxt, cur)

        cur = jax.lax.fori_loop(0, _STEP_BOUND, climb_body, seeds)

        # 3. The local max founds this round's cluster of its component:
        # record the cluster identity (seed) and its maxLeaf (= the
        # climb result, cluster.cc:84-85) at the SEED slot.  Inactive
        # component slots scatter to the dropped index u — a shared
        # placeholder index would collide with (and nondeterministically
        # clobber) a valid write.
        valid = seeds < _INF
        cluster_seed = cluster_seed.at[
            jnp.where(valid, cur, u)].set(seeds, mode="drop")
        max_leaf_at_seed = max_leaf_at_seed.at[
            jnp.where(valid, seeds, u)].set(cur, mode="drop")

        # 4. Descent: spread the new clusters' seeds to unassigned
        # neighbours with count[x] >= 2*count[y], through members of
        # the SAME round's cluster only.  new_member marks this
        # round's absorptions (the spread frontier's source set).
        new_member = jnp.zeros(u, bool).at[
            jnp.where(valid, cur, u)].set(True, mode="drop")

        def descent_body(_, st):
            cs, nm = st
            src_ok = nm[ex]
            elig = src_ok & (cs[ey] < 0) & shrink_ok
            # Components are disjoint, so conflicting scatters cannot
            # happen; scatter the source's cluster seed.
            upd = jnp.full(u, -1, jnp.int32).at[
                jnp.where(elig, ey, u)].max(
                jnp.where(elig, cs[ex], -1), mode="drop")
            absorbed = (upd >= 0) & (cs < 0)
            cs = jnp.where(absorbed, upd, cs)
            nm = nm | absorbed
            return cs, nm

        cluster_seed, _ = jax.lax.fori_loop(
            0, _STEP_BOUND, descent_body, (cluster_seed, new_member))
        return cluster_seed, max_leaf_at_seed, jnp.any(
            cluster_seed < 0)

    def cond(state):
        return state[2]

    state = (jnp.full(u, -1, jnp.int32), jnp.full(u, -1, jnp.int32),
             jnp.bool_(True))
    cluster_seed, max_leaf_at_seed, _ = jax.lax.while_loop(
        cond, round_body, state)
    return cluster_seed, max_leaf_at_seed


def cluster_directional_device(counts, pa, pb,
                               comp=None) -> ClusterResult:
    """Directional clustering on the device; bit-exact ClusterResult
    (same contract as cluster_exact(maximum=False)).

    counts int64 [u]; (pa, pb) the sorted unique pair list; ``comp``
    optional precomputed component labels (min node per component)."""
    u = len(counts)
    if u == 0:
        z = np.zeros(0, np.int64)
        return ClusterResult(z, z, z, z)
    if comp is None:
        try:
            from ._native import components

            comp = components(pa, pb, u)
        except ImportError:  # pragma: no cover - extension not built
            from .labelprop import connected_components_device

            comp = connected_components_device(
                np.asarray(pa, np.int32), np.asarray(pb, np.int32), u)
    counts64 = np.asarray(counts, np.int64)
    if counts64.max(initial=0) > _INF // 2:
        # 2*count must stay within int32 (the doubling eligibility
        # compare); callers route such tables to the host walk
        # (pipeline.cluster_dispatch pre-checks this bound).
        raise ValueError("counts exceed the device formulation's "
                         "int32 doubling range")
    cluster_seed, max_leaf_at_seed = _directional_rounds(
        jnp.asarray(counts64.astype(np.int32)),
        jnp.asarray(np.asarray(comp, np.int32)),
        jnp.asarray(np.asarray(pa, np.int32)),
        jnp.asarray(np.asarray(pb, np.int32)), u=u)
    cluster_seed = np.asarray(cluster_seed).astype(np.int64)
    max_leaf_at_seed = np.asarray(max_leaf_at_seed).astype(np.int64)

    # Final ids = ascending rank of the cluster seeds (reference order;
    # shared renumber helper of the -x device route).
    from .labelprop import renumber_components

    labels, k, seeds = renumber_components(cluster_seed)
    max_leaf = max_leaf_at_seed[seeds]
    max_count = counts64[max_leaf]
    size = np.bincount(labels - 1, weights=counts64,
                       minlength=k).astype(np.int64)
    return ClusterResult(labels, max_leaf, max_count, size)
