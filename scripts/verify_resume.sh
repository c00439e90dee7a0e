#!/usr/bin/env bash
# One-command, timeout-surviving correctness dump (VERDICT r13 item 6).
#
#   scripts/verify_resume.sh <sfDir> <outDir> [attemptSecs] [maxAttempts]
#
# Runs `graft.Verify <sfDir> <outDir> --resume` under a per-attempt timeout,
# retrying until Verify prints its DONE marker (the registry sweep finished)
# or maxAttempts is exhausted. Completed queries persist per attempt
# (Hadoop _SUCCESS markers), so each retry only runs what's left — the sf1
# correctness artifact is this single invocation:
#
#   SPARK_GRAFT_CPUS=16 scripts/verify_resume.sh /tmp/graft_sf1 /tmp/vout_sf1
#   python3 scripts/check.py /tmp/vout_sf1 /tmp/graft_sf1
#
# Defaults: 3000 s per attempt (under typical 1 h harness caps with margin
# for sbt startup), 6 attempts.
set -u
SF_DIR=${1:?usage: verify_resume.sh <sfDir> <outDir> [attemptSecs] [maxAttempts]}
OUT_DIR=${2:?usage: verify_resume.sh <sfDir> <outDir> [attemptSecs] [maxAttempts]}
ATTEMPT_SECS=${3:-3000}
MAX_ATTEMPTS=${4:-6}
# optional comma-separated query-name prefixes (local iteration only)
PREFIXES=${VERIFY_PREFIXES:+ $VERIFY_PREFIXES}

for attempt in $(seq 1 "$MAX_ATTEMPTS"); do
  echo "[verify_resume] attempt $attempt/$MAX_ATTEMPTS (timeout ${ATTEMPT_SECS}s)" >&2
  LOG=$(mktemp /tmp/verify_resume_XXXX.log)
  timeout "$ATTEMPT_SECS" sbt -batch \
    "runMain graft.Verify $SF_DIR $OUT_DIR$PREFIXES --resume" 2>&1 | tee "$LOG" \
    | grep -E "^\[verify\]|\[error\] \[verify\]" >&2 || true
  if grep -q "\[verify\] DONE" "$LOG"; then
    grep "\[verify\] DONE" "$LOG" >&2
    rm -f "$LOG"
    echo "[verify_resume] complete after $attempt attempt(s)" >&2
    exit 0
  fi
  rm -f "$LOG"
  echo "[verify_resume] attempt $attempt did not finish; resuming" >&2
done
echo "[verify_resume] FAILED: sweep incomplete after $MAX_ATTEMPTS attempts" >&2
exit 1
