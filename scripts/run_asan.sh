#!/bin/bash
# AddressSanitizer run of the native I/O core, mirroring the reference's
# asan_makefile workflow (/root/reference/src/app/asan_makefile): build the
# sanitized libbamcore variant and drive it through the native + BAM-I/O
# test suites.  Zero ASan reports = pass (the suite aborts on any report).
set -euo pipefail
cd "$(dirname "$0")/.."

make -C src/native asan

LIBASAN=$(g++ -print-file-name=libasan.so)
export HIFIMETH_BAMCORE="$PWD/hifimeth_tpu/io/libbamcore_asan.so"
# leak detection off: CPython/JAX hold allocations for process lifetime and
# would drown real reports; ASan's buffer/thread checks stay fully active
export ASAN_OPTIONS="detect_leaks=0:abort_on_error=1"
export JAX_PLATFORMS=cpu

LD_PRELOAD="$LIBASAN" python -m pytest tests/test_native.py tests/test_bam_io.py -q
echo "ASan run clean: no reports from the native core"
