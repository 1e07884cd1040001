#!/usr/bin/env bash
# Hardware gate: the full CLI forced through the Pallas sweep kernel on
# the real backend (whatever `jax.devices()` exposes — a TPU chip under
# the production setup), byte-compared against the C++ baseline.  The
# CPU-mesh test suite exercises the same kernel under interpret=True;
# this script is the on-silicon counterpart (run it on a TPU host after
# kernel or packing changes).
set -euo pipefail
cd "$(dirname "$0")/.."
REPO=$(pwd)
READS=${READS:-300000}

if [ ! -x baseline/humid_ref ] || [ baseline/humid_ref.cpp -nt baseline/humid_ref ]; then
  g++ -O2 -std=c++17 -o baseline/humid_ref baseline/humid_ref.cpp -lz
fi

D=$(mktemp -d)
trap 'rm -rf "$D"' EXIT

python - "$D" "$READS" <<'EOF'
import sys
sys.path.insert(0, ".")
import bench
bench.gen_dataset(f"{sys.argv[1]}/hw.fastq", int(sys.argv[2]),
                  read_len=60, seed=1234)
EOF

baseline/humid_ref -d "$D/ref" -s -a "$D/hw.fastq"

PYTHONPATH="$REPO:${PYTHONPATH:-}" \
HUMID_TPU_STRATEGY=bucketed HUMID_TPU_IMPL=pallas \
python -m humid_tpu -d "$D/tpu" -s -a -l /dev/null "$D/hw.fastq"

# Fused device-resident pipeline on silicon: the same input through
# ops/fused.py's resident-table programs must match byte-for-byte too.
# Phase-level overrides are SCRUBBED (env -u): any ambient
# strategy/impl/unique/overlap knob would silently exclude the fused
# route and turn this leg into a false pass.
env -u HUMID_TPU_STRATEGY -u HUMID_TPU_IMPL -u HUMID_TPU_UNIQUE \
    -u HUMID_TPU_OVERLAP_UNIQUE \
    PYTHONPATH="$REPO:${PYTHONPATH:-}" HUMID_TPU_FUSED=1 \
    python -m humid_tpu -d "$D/fused" -s -a -l /dev/null "$D/hw.fastq"

PYTHONPATH="$REPO:${PYTHONPATH:-}" python - <<'EOF'
import jax
print(f"backend: {jax.default_backend()} ({jax.devices()})")
EOF

status=0
for f in "$D"/ref/*; do
  b=$(basename "$f")
  if cmp -s "$f" "$D/tpu/$b"; then
    echo "OK $b"
  else
    echo "DIFF $b"
    status=1
  fi
  if cmp -s "$f" "$D/fused/$b"; then
    echo "OK (fused) $b"
  else
    echo "DIFF (fused) $b"
    status=1
  fi
done
[ $status -eq 0 ] && echo "hardware Pallas + fused gates OK"
[ $status -eq 0 ] || exit $status

# Pallas RDMA ring kernel on silicon: a block far beyond the old
# 4096-row VMEM cap streams through the HBM comm slots and must match
# the host dense scan exactly (VERDICT r4 #2).
PYTHONPATH="$REPO:${PYTHONPATH:-}" python - <<'EOF'
import sys
sys.path.insert(0, "scripts")
import numpy as np
from engine_xover import gen_uniques
from humid_tpu.parallel import sharded_neighbor_pairs_pallas_ring
from humid_tpu.parallel.mesh import data_mesh
from humid_tpu.ops.neighbors import find_neighbor_pairs

uniq = gen_uniques(40000, 24)[:40000]
a1, b1 = sharded_neighbor_pairs_pallas_ring(
    uniq, 1, word_length=24, mesh=data_mesh(1))
a2, b2 = find_neighbor_pairs(uniq, 1, strategy="dense", word_length=24,
                             impl="xor")
assert np.array_equal(a1, a2) and np.array_equal(b1, b2), \
    "pallas ring hardware mismatch"
print(f"hardware RDMA-ring gate OK ({len(uniq)} rows/shard, "
      f"{len(a1)} pairs)")
EOF
