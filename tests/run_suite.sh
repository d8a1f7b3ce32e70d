#!/usr/bin/env bash
# Full CPU test suite, one pytest process per file.
#
# Why not one `pytest tests/`? XLA:CPU's persistent-cache serializer and
# deserializer segfault/abort nondeterministically in LONG multi-file pytest
# processes (observed at different tests across runs, always inside
# compilation_cache get/put; see tests/conftest.py and CLAUDE.md).  Every
# per-file process is reliable — and they still share the persistent compile
# cache, so a warm full-suite pass stays fast on the 1-core host.
set -u
cd "$(dirname "$0")/.."
# per-file processes are short-lived, so the persistent compile cache is safe
# here (and essential for speed on the 1-core host); plain `pytest tests/`
# leaves it off — see conftest.py
export FOCALNET_TEST_CACHE=1
fail=0
total=""
for f in tests/test_*.py; do
  echo "=== $f"
  python -m pytest "$f" -q --no-header "$@"
  rc=$?
  # pytest rc 5 = no tests collected (e.g. TPU-only file off-TPU) — fine
  if [ $rc -ne 0 ] && [ $rc -ne 5 ]; then
    fail=1
    total="$total $f"
  fi
done
if [ $fail -ne 0 ]; then
  echo "FAILED files:$total"
else
  echo "ALL FILES PASSED"
fi
exit $fail
