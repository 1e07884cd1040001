#!/usr/bin/env bash
# Memory-error gate for the native extensions — the analogue of the
# reference's valgrind CI step (tests/Makefile:32-33 runs its suite under
# `valgrind --error-exitcode=1 --leak-check=full`).  valgrind is not in
# this image, so the extensions are rebuilt with AddressSanitizer into a
# scratch tree and the native-facing tests run with libasan preloaded.
set -euo pipefail
cd "$(dirname "$0")/.."

BUILD=$(mktemp -d)
trap 'rm -rf "$BUILD"' EXIT

CFLAGS="-fsanitize=address -fno-omit-frame-pointer -g -O1" \
  python setup.py build_ext --build-lib "$BUILD" --build-temp "$BUILD/tmp" \
  >/dev/null

LIBASAN=$(gcc -print-file-name=libasan.so)
echo "ASan build in $BUILD (preloading $LIBASAN)"

# leak detection off: the CPython interpreter itself "leaks" at exit.
# Only the native-facing tests run sanitized — XLA jit compiles are
# unusably slow (and can wedge) under ASan interception, so tests that
# drive jax device code (-k "not device") are excluded here; the plain
# suite covers them.
ASAN_OPTIONS=detect_leaks=0 \
LD_PRELOAD="$LIBASAN" \
PYTHONPATH="$BUILD:$PWD:$PWD/tests" \
JAX_PLATFORMS=cpu \
python -m pytest tests/test_native.py tests/test_packing.py \
  tests/test_words.py tests/test_cluster.py -q -p no:cacheprovider \
  -k "not device" "$@"
echo "native memcheck OK"
