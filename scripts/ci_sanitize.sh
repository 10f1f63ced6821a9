#!/usr/bin/env bash
# Run the native-core differential tests under ASan+UBSan (SURVEY.md §5.2:
# the reference shipped no sanitizer config; this is the add-in-CI item).
#
# Builds csrc/ with -fsanitize=address,undefined and loads the
# instrumented library into the pytest process via LD_PRELOAD'd libasan
# (required because python itself is uninstrumented) and the
# BODA_TPU_CORE_LIB override in boda_tpu/utils/cpplib.py.
#
# detect_leaks is off: CPython intentionally leaks interned objects at
# exit; ASan still catches heap-buffer-overflow / use-after-free / UB in
# the C++ paths, which is what the differential tests drive.
set -euo pipefail
cd "$(dirname "$0")/.."

make -C csrc sanitize

LIBASAN="$(${CXX:-g++} -print-file-name=libasan.so)"
[ -f "$LIBASAN" ] || { echo "libasan.so not found"; exit 1; }

LD_PRELOAD="$LIBASAN" \
ASAN_OPTIONS="detect_leaks=0:abort_on_error=1" \
UBSAN_OPTIONS="print_stacktrace=1:halt_on_error=1" \
BODA_TPU_CORE_LIB="$PWD/build/libboda_tpu_core_san.so" \
python -m pytest tests/test_cpp_core.py tests/test_lexp.py -q "$@"

echo "ci_sanitize: native differential tests clean under ASan+UBSan"
