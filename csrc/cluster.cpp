// Native exact-clustering kernel for humid_tpu.
//
// Implements the reference's two clustering methods on a CSR adjacency
// (semantics of /root/reference/src/cluster.cc, reproduced bit-exactly by
// the Python oracle in humid_tpu/cluster/exact.py):
//   * maximum (-x): pre-order flood fill, strict '>' max update
//     (cluster.cc:20-25, 72-80)
//   * directional (default): restart-scan hill climb to a local max
//     (cluster.cc:39-51), then constrained >=2x descent (cluster.cc:58-69)
// Both use an explicit stack — no recursion, no stack-overflow failure
// mode (the reference segfaults on deep clusters,
// docs/troubleshooting.rst:6-18).
//
// Exposed as the CPython module humid_tpu.cluster._ccluster, wrapped by
// humid_tpu/cluster/_native.py.  Buffers are exchanged via the buffer
// protocol (numpy int64 arrays); no numpy C API dependency.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <utility>
#include <vector>

namespace {

struct Frame {
  int64_t node;
  int64_t ptr;
};

struct SeedResult {
  int64_t ml, mc, size;
};

// One cluster grown from ``seed`` under id ``cid`` — the single
// definition of the reference's per-seed semantics, shared by the
// sequential and component-parallel drivers so the two engines cannot
// diverge (their outputs are contractually bit-identical).
SeedResult cluster_one_seed(const int64_t* counts, const int64_t* indptr,
                            const int64_t* indices, bool maximum,
                            int64_t seed, int64_t cid, int64_t* labels,
                            std::vector<Frame>& stack) {
  int64_t ml = -1, mc = 0, size = 0;

  int64_t root = seed;
  if (!maximum) {
    // Hill climb: jump to the FIRST unassigned neighbour with
    // count >= 2*current and restart the scan (cluster.cc:39-51).
    int64_t i = indptr[root], end = indptr[root + 1];
    while (i < end) {
      const int64_t nb = indices[i++];
      if (labels[nb] == 0 && counts[nb] >= 2 * counts[root]) {
        root = nb;
        i = indptr[root];
        end = indptr[root + 1];
      }
    }
    // updateMaxCount_ once, on the local max only (cluster.cc:84-85).
    ml = root;
    mc = counts[root];
  }

  // Pre-order descent.  maximum: absorb every unassigned neighbour and
  // track the strict max (cluster.cc:72-80).  directional: absorb
  // unassigned neighbours with current.count >= 2*neighbour.count
  // (cluster.cc:58-69).
  labels[root] = cid;
  size += counts[root];
  if (maximum && counts[root] > mc) {
    mc = counts[root];
    ml = root;
  }
  stack.clear();
  stack.push_back({root, indptr[root]});
  while (!stack.empty()) {
    Frame& top = stack.back();
    if (top.ptr == indptr[top.node + 1]) {
      stack.pop_back();
      continue;
    }
    const int64_t cur = top.node;
    const int64_t nb = indices[top.ptr++];
    if (labels[nb] != 0) continue;
    if (maximum) {
      labels[nb] = cid;
      size += counts[nb];
      if (counts[nb] > mc) {
        mc = counts[nb];
        ml = nb;
      }
      stack.push_back({nb, indptr[nb]});
    } else if (counts[cur] >= 2 * counts[nb]) {
      labels[nb] = cid;
      size += counts[nb];
      stack.push_back({nb, indptr[nb]});
    }
  }
  return {ml, mc, size};
}

int64_t cluster_impl(const int64_t* counts, const int64_t* indptr,
                     const int64_t* indices, int64_t u, bool maximum,
                     int64_t* labels, int64_t* max_leaf, int64_t* max_count,
                     int64_t* size_out) {
  int64_t k = 0;
  std::vector<Frame> stack;
  stack.reserve(64);
  for (int64_t seed = 0; seed < u; ++seed) {
    if (labels[seed] != 0) continue;
    // ids start at 1 (humid.cc:177)
    const SeedResult r = cluster_one_seed(counts, indptr, indices, maximum,
                                          seed, k + 1, labels, stack);
    max_leaf[k] = r.ml;
    max_count[k] = r.mc;
    size_out[k] = r.size;
    ++k;
  }
  return k;
}

// ---------------------------------------------------------------------------
// Component-parallel clustering (VERDICT r3 #8).
//
// Both reference methods are sequential only ACROSS interacting clusters:
// within one cluster's descent, membership is a reachability closure
// (monotone absorption — traversal order cannot change the member set),
// and clusters in different connected components never interact.  So:
//   1. union-find the components (path halving),
//   2. run the exact sequential algorithm per component, in parallel
//      (disjoint label writes),
//   3. renumber clusters globally by seed node index with one O(u)
//      ascending pass — the sequential algorithm's ids are exactly the
//      seeds' lexicographic ranks, because a cluster's seed is the
//      smallest node not absorbed by any earlier cluster.
// Bit-identical to cluster_impl for both methods; validated against it
// in tests (tests/test_cluster.py).
// ---------------------------------------------------------------------------

int64_t find_root(std::vector<int64_t>& parent, int64_t x) {
  while (parent[x] != x) {
    parent[x] = parent[parent[x]];  // path halving
    x = parent[x];
  }
  return x;
}

int64_t cluster_parallel_impl(const int64_t* counts, const int64_t* indptr,
                              const int64_t* indices, int64_t u, bool maximum,
                              int64_t* labels, int64_t* max_leaf,
                              int64_t* max_count, int64_t* size_out) {
  // 1. Connected components.  Prologue engineering (round-5: the
  // serial prologue was the measured reason the parallel variant lost
  // on few-core hosts): union each unordered edge ONCE (CSR holds both
  // directions — skipping nb < node halves the find_root work), then
  // resolve every node's root in PARALLEL with read-only walks (the
  // union pass's path halving keeps chains short, and nothing mutates
  // parent afterwards, so concurrent walks are race-free).
  std::vector<int64_t> parent(u);
  for (int64_t i = 0; i < u; ++i) parent[i] = i;
  for (int64_t node = 0; node < u; ++node) {
    for (int64_t e = indptr[node]; e < indptr[node + 1]; ++e) {
      const int64_t nb = indices[e];
      if (nb < node) continue;  // each undirected edge once
      int64_t a = find_root(parent, node);
      int64_t b = find_root(parent, nb);
      if (a != b) parent[a < b ? b : a] = a < b ? a : b;
    }
  }
  std::vector<int64_t> roots(u);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < u; ++i) {
    int64_t x = i;
    while (parent[x] != x) x = parent[x];
    roots[i] = x;
  }
  // Dense component ids in ascending-min-node order (union by min =>
  // roots[i] <= i, equality iff root); nodes grouped by component with
  // a counting sort (nodes within a component ascend).
  std::vector<int64_t> comp_of(u);
  std::vector<int64_t> comp_sz;
  for (int64_t i = 0; i < u; ++i) {
    if (roots[i] == i) {
      comp_of[i] = static_cast<int64_t>(comp_sz.size());
      comp_sz.push_back(0);
    } else {
      comp_of[i] = comp_of[roots[i]];
    }
    ++comp_sz[comp_of[i]];
  }
  const int64_t n_comp = static_cast<int64_t>(comp_sz.size());
  std::vector<int64_t> comp_off(n_comp + 1, 0);
  for (int64_t c = 0; c < n_comp; ++c) comp_off[c + 1] = comp_off[c] + comp_sz[c];
  std::vector<int64_t> comp_nodes(u);
  {
    std::vector<int64_t> cur(comp_off.begin(), comp_off.end() - 1);
    for (int64_t i = 0; i < u; ++i) comp_nodes[cur[comp_of[i]]++] = i;
  }

  // 2. Sequential algorithm per component, components in parallel.
  // Cluster results land at slot = comp_off[c] + local index (clusters
  // per component <= nodes per component); labels hold slot + 1.
  std::vector<int64_t> slot_seed(u), slot_ml(u), slot_mc(u), slot_sz(u);
  std::vector<int64_t> comp_k(n_comp, 0);
#pragma omp parallel
  {
    std::vector<Frame> stack;
    stack.reserve(64);
#pragma omp for schedule(guided)
    for (int64_t c = 0; c < n_comp; ++c) {
      int64_t k_local = 0;
      for (int64_t si = comp_off[c]; si < comp_off[c + 1]; ++si) {
        const int64_t seed = comp_nodes[si];
        if (labels[seed] != 0) continue;
        const int64_t slot = comp_off[c] + k_local;
        const SeedResult r = cluster_one_seed(
            counts, indptr, indices, maximum, seed, slot + 1, labels,
            stack);
        slot_seed[slot] = seed;
        slot_ml[slot] = r.ml;
        slot_mc[slot] = r.mc;
        slot_sz[slot] = r.size;
        ++k_local;
      }
      comp_k[c] = k_local;
    }
  }

  // 3. Global renumber by seed index: one ascending pass over nodes.
  // gid[slot] = rank of its seed among all seeds (1-based).
  std::vector<int64_t> slot_of_seed(u, -1);
  for (int64_t c = 0; c < n_comp; ++c) {
    for (int64_t s = comp_off[c]; s < comp_off[c] + comp_k[c]; ++s) {
      slot_of_seed[slot_seed[s]] = s;
    }
  }
  std::vector<int64_t> gid(u, 0);
  int64_t k = 0;
  for (int64_t node = 0; node < u; ++node) {
    const int64_t s = slot_of_seed[node];
    if (s < 0) continue;
    gid[s] = ++k;
    max_leaf[k - 1] = slot_ml[s];
    max_count[k - 1] = slot_mc[s];
    size_out[k - 1] = slot_sz[s];
  }
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < u; ++i) labels[i] = gid[labels[i] - 1];
  return k;
}

PyObject* cluster_parallel_into(PyObject* /*self*/, PyObject* args) {
  Py_buffer counts_b, indptr_b, indices_b, labels_b, ml_b, mc_b, sz_b;
  int maximum;
  if (!PyArg_ParseTuple(args, "y*y*y*pw*w*w*w*", &counts_b, &indptr_b,
                        &indices_b, &maximum, &labels_b, &ml_b, &mc_b,
                        &sz_b)) {
    return nullptr;
  }
  const int64_t u = static_cast<int64_t>(counts_b.len / 8);
  int64_t k = 0;
  if (static_cast<int64_t>(indptr_b.len / 8) != u + 1 ||
      static_cast<int64_t>(labels_b.len / 8) != u ||
      static_cast<int64_t>(ml_b.len / 8) < u ||
      static_cast<int64_t>(mc_b.len / 8) < u ||
      static_cast<int64_t>(sz_b.len / 8) < u) {
    PyBuffer_Release(&counts_b);
    PyBuffer_Release(&indptr_b);
    PyBuffer_Release(&indices_b);
    PyBuffer_Release(&labels_b);
    PyBuffer_Release(&ml_b);
    PyBuffer_Release(&mc_b);
    PyBuffer_Release(&sz_b);
    PyErr_SetString(PyExc_ValueError,
                    "cluster_parallel_into: bad buffer sizes");
    return nullptr;
  }
  Py_BEGIN_ALLOW_THREADS;
  k = cluster_parallel_impl(
      static_cast<const int64_t*>(counts_b.buf),
      static_cast<const int64_t*>(indptr_b.buf),
      static_cast<const int64_t*>(indices_b.buf), u, maximum != 0,
      static_cast<int64_t*>(labels_b.buf),
      static_cast<int64_t*>(ml_b.buf), static_cast<int64_t*>(mc_b.buf),
      static_cast<int64_t*>(sz_b.buf));
  Py_END_ALLOW_THREADS;
  PyBuffer_Release(&counts_b);
  PyBuffer_Release(&indptr_b);
  PyBuffer_Release(&indices_b);
  PyBuffer_Release(&labels_b);
  PyBuffer_Release(&ml_b);
  PyBuffer_Release(&mc_b);
  PyBuffer_Release(&sz_b);
  return PyLong_FromLongLong(static_cast<long long>(k));
}

PyObject* cluster_into(PyObject* /*self*/, PyObject* args) {
  Py_buffer counts_b, indptr_b, indices_b, labels_b, ml_b, mc_b, sz_b;
  int maximum;
  if (!PyArg_ParseTuple(args, "y*y*y*pw*w*w*w*", &counts_b, &indptr_b,
                        &indices_b, &maximum, &labels_b, &ml_b, &mc_b,
                        &sz_b)) {
    return nullptr;
  }
  const int64_t u = static_cast<int64_t>(counts_b.len / 8);
  int64_t k = 0;
  if (static_cast<int64_t>(indptr_b.len / 8) != u + 1 ||
      static_cast<int64_t>(labels_b.len / 8) != u ||
      static_cast<int64_t>(ml_b.len / 8) < u ||
      static_cast<int64_t>(mc_b.len / 8) < u ||
      static_cast<int64_t>(sz_b.len / 8) < u) {
    PyBuffer_Release(&counts_b);
    PyBuffer_Release(&indptr_b);
    PyBuffer_Release(&indices_b);
    PyBuffer_Release(&labels_b);
    PyBuffer_Release(&ml_b);
    PyBuffer_Release(&mc_b);
    PyBuffer_Release(&sz_b);
    PyErr_SetString(PyExc_ValueError, "cluster_into: bad buffer sizes");
    return nullptr;
  }
  Py_BEGIN_ALLOW_THREADS;
  k = cluster_impl(static_cast<const int64_t*>(counts_b.buf),
                   static_cast<const int64_t*>(indptr_b.buf),
                   static_cast<const int64_t*>(indices_b.buf), u,
                   maximum != 0, static_cast<int64_t*>(labels_b.buf),
                   static_cast<int64_t*>(ml_b.buf),
                   static_cast<int64_t*>(mc_b.buf),
                   static_cast<int64_t*>(sz_b.buf));
  Py_END_ALLOW_THREADS;
  PyBuffer_Release(&counts_b);
  PyBuffer_Release(&indptr_b);
  PyBuffer_Release(&indices_b);
  PyBuffer_Release(&labels_b);
  PyBuffer_Release(&ml_b);
  PyBuffer_Release(&mc_b);
  PyBuffer_Release(&sz_b);
  return PyLong_FromLongLong(static_cast<long long>(k));
}

// Ownership-masked clustering: the exact sequential walk, but only
// seeds whose node is owned start clusters (the host-sharded cluster
// phase, humid_tpu/parallel/cluster.py).  Ownership is per connected
// component, and walks never leave their component, so the masked walk
// over the FULL CSR equals the walk over the owned components' induced
// subgraph — without building one.  Local ids are 1..k in ascending
// owned-seed order; seeds/max_leaf are GLOBAL node indices.
PyObject* cluster_masked_into(PyObject* /*self*/, PyObject* args) {
  Py_buffer counts_b, indptr_b, indices_b, own_b, labels_b, seeds_b,
      ml_b, mc_b, sz_b;
  int maximum;
  if (!PyArg_ParseTuple(args, "y*y*y*py*w*w*w*w*w*", &counts_b,
                        &indptr_b, &indices_b, &maximum, &own_b,
                        &labels_b, &seeds_b, &ml_b, &mc_b, &sz_b)) {
    return nullptr;
  }
  const int64_t u = static_cast<int64_t>(counts_b.len / 8);
  int64_t k = 0;
  bool ok = static_cast<int64_t>(indptr_b.len / 8) == u + 1 &&
            static_cast<int64_t>(own_b.len) == u &&
            static_cast<int64_t>(labels_b.len / 8) == u &&
            static_cast<int64_t>(seeds_b.len / 8) >= u &&
            static_cast<int64_t>(ml_b.len / 8) >= u &&
            static_cast<int64_t>(mc_b.len / 8) >= u &&
            static_cast<int64_t>(sz_b.len / 8) >= u;
  if (!ok) {
    PyErr_SetString(PyExc_ValueError,
                    "cluster_masked_into: bad buffer sizes");
  } else {
    Py_BEGIN_ALLOW_THREADS;
    const int64_t* counts = static_cast<const int64_t*>(counts_b.buf);
    const int64_t* indptr = static_cast<const int64_t*>(indptr_b.buf);
    const int64_t* indices = static_cast<const int64_t*>(indices_b.buf);
    const uint8_t* own = static_cast<const uint8_t*>(own_b.buf);
    int64_t* labels = static_cast<int64_t*>(labels_b.buf);
    int64_t* seeds = static_cast<int64_t*>(seeds_b.buf);
    int64_t* ml = static_cast<int64_t*>(ml_b.buf);
    int64_t* mc = static_cast<int64_t*>(mc_b.buf);
    int64_t* sz = static_cast<int64_t*>(sz_b.buf);
    std::vector<Frame> stack;
    stack.reserve(64);
    for (int64_t seed = 0; seed < u; ++seed) {
      if (!own[seed] || labels[seed] != 0) continue;
      const SeedResult r = cluster_one_seed(counts, indptr, indices,
                                            maximum != 0, seed, k + 1,
                                            labels, stack);
      seeds[k] = seed;
      ml[k] = r.ml;
      mc[k] = r.mc;
      sz[k] = r.size;
      ++k;
    }
    Py_END_ALLOW_THREADS;
  }
  PyBuffer_Release(&counts_b);
  PyBuffer_Release(&indptr_b);
  PyBuffer_Release(&indices_b);
  PyBuffer_Release(&own_b);
  PyBuffer_Release(&labels_b);
  PyBuffer_Release(&seeds_b);
  PyBuffer_Release(&ml_b);
  PyBuffer_Release(&mc_b);
  PyBuffer_Release(&sz_b);
  if (!ok) return nullptr;
  return PyLong_FromLongLong(static_cast<long long>(k));
}

// Connected components from an (a, b) edge list: labels[i] = min node
// index of i's component (union-find, path halving, union by min).
// The prologue of cluster_parallel_impl exposed on its own — the
// host-sharded cluster phase (humid_tpu/parallel/cluster.py) needs
// component minima without paying a jax compile for a label
// propagation the host can do in one O(u + E) pass.
PyObject* components_into(PyObject* /*self*/, PyObject* args) {
  Py_buffer a_b, b_b, labels_b;
  if (!PyArg_ParseTuple(args, "y*y*w*", &a_b, &b_b, &labels_b)) {
    return nullptr;
  }
  const int64_t e = static_cast<int64_t>(a_b.len / 8);
  const int64_t u = static_cast<int64_t>(labels_b.len / 8);
  if (static_cast<int64_t>(b_b.len / 8) != e) {
    PyBuffer_Release(&a_b);
    PyBuffer_Release(&b_b);
    PyBuffer_Release(&labels_b);
    PyErr_SetString(PyExc_ValueError,
                    "components_into: edge buffers differ in length");
    return nullptr;
  }
  Py_BEGIN_ALLOW_THREADS;
  {
    const int64_t* ea = static_cast<const int64_t*>(a_b.buf);
    const int64_t* eb = static_cast<const int64_t*>(b_b.buf);
    int64_t* labels = static_cast<int64_t*>(labels_b.buf);
    std::vector<int64_t> parent(u);
    for (int64_t i = 0; i < u; ++i) parent[i] = i;
    for (int64_t i = 0; i < e; ++i) {
      int64_t ra = find_root(parent, ea[i]);
      int64_t rb = find_root(parent, eb[i]);
      if (ra != rb) parent[ra < rb ? rb : ra] = ra < rb ? ra : rb;
    }
    for (int64_t i = 0; i < u; ++i) labels[i] = find_root(parent, i);
  }
  Py_END_ALLOW_THREADS;
  PyBuffer_Release(&a_b);
  PyBuffer_Release(&b_b);
  PyBuffer_Release(&labels_b);
  Py_RETURN_NONE;
}

PyMethodDef methods[] = {
    {"cluster_masked_into", cluster_masked_into, METH_VARARGS,
     "cluster_masked_into(counts, indptr, indices, maximum, own, "
     "labels, seeds, max_leaf, max_count, size) -> k.  Exact walk over "
     "owned-component seeds only (own: uint8 per node); labels local "
     "1..k, seeds/max_leaf global node indices."},
    {"components_into", components_into, METH_VARARGS,
     "components_into(edges_a, edges_b, labels) -> None.  labels[i] = "
     "min node index of i's connected component (all buffers int64; "
     "labels sized u)."},
    {"cluster_into", cluster_into, METH_VARARGS,
     "cluster_into(counts, indptr, indices, maximum, labels, max_leaf, "
     "max_count, size) -> num_clusters.  All buffers int64; labels must be "
     "zero-initialized."},
    {"cluster_parallel_into", cluster_parallel_into, METH_VARARGS,
     "cluster_parallel_into(...) -> num_clusters: component-parallel "
     "variant of cluster_into (bit-identical output; OpenMP over "
     "connected components, renumbered by seed rank)."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "_ccluster",
    "Native CSR clustering (reference semantics of cluster.cc).", -1,
    methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__ccluster(void) { return PyModule_Create(&module); }
