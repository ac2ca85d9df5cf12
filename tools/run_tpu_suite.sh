#!/usr/bin/env bash
# Repeatable on-chip test suite (VERDICT r3 weak #7).
#
# Runs the full suite ON THE REAL CHIP the only way that works under the
# axon tunnel: per-module, strictly serialized (the single chip serializes
# across processes — a second TPU-touching process blocks for minutes),
# each module under `timeout` so a hang cannot eat the session.  The
# persistent compile cache (.jax_cache/, enabled by tests/conftest.py when
# RUN_TPU_TESTS=1) makes warm re-runs much faster than the ~100-minute
# cold first pass recorded in BASELINE.md.
#
# Usage:  tools/run_tpu_suite.sh [per-module-timeout-seconds]
# Output: per-module PASS/FAIL lines + tools/tpu_suite_result.json summary.

set -u
cd "$(dirname "$0")/.."

TIMEOUT_S="${1:-5400}"
MODULES=(
  test_text test_config test_utils test_data test_audio test_modules
  test_model test_oracle_tf test_ops_pallas test_parallel test_train_e2e
)

RESULT_JSON="tools/tpu_suite_result.json"
echo '{' > "$RESULT_JSON.tmp"
overall=0
first=1
for mod in "${MODULES[@]}"; do
  t0=$(date +%s)
  RUN_TPU_TESTS=1 timeout "$TIMEOUT_S" \
    python -m pytest "tests/${mod}.py" -q --no-header 2>&1 | tail -2
  rc=${PIPESTATUS[0]}
  t1=$(date +%s)
  status=PASS
  if [ "$rc" -ne 0 ]; then status=FAIL; overall=1; fi
  echo "== ${mod}: ${status} (rc=${rc}, $((t1 - t0))s)"
  [ "$first" -eq 0 ] && echo ',' >> "$RESULT_JSON.tmp"
  first=0
  printf '  "%s": {"status": "%s", "rc": %d, "wall_s": %d}' \
    "$mod" "$status" "$rc" "$((t1 - t0))" >> "$RESULT_JSON.tmp"
done
printf '\n}\n' >> "$RESULT_JSON.tmp"
mv "$RESULT_JSON.tmp" "$RESULT_JSON"
echo "summary written to $RESULT_JSON"
exit "$overall"
