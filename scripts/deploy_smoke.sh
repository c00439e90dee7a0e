#!/usr/bin/env bash
# Deploy-packaging smoke (VERDICT r14 item 4): prove the PACKAGED jar runs
# under spark-submit — `sbt package` + submit, no sbt runtime — in both
#   local[4]               (single-JVM, the harness's usual shape) and
#   local-cluster[2,2,..]  (REAL multi-process executors: closures, Encoders,
#                           the Catalyst extensions, DSv2 sources and state
#                           stores all cross a serialization boundary),
# then assert the two modes produced IDENTICAL result hashes (and that each
# mode's streaming resume matched its batch twin internally — DeploySmoke
# exits nonzero otherwise).
#
# This is the offline stand-in for a real cluster: the repo's only runtime
# deps are Spark's own jars, so the same invocation works on a standalone /
# YARN / k8s master by swapping --master (see README "Running on a cluster").
set -euo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/root/testdata/sf0.001}
SPARK_HOME=${SPARK_HOME:-/opt/spark}
JAR=target/scala-2.13/hazelcastjetspark_2.13-0.1.0.jar
OUT=${GRAFT_DEPLOY_OUT:-/tmp/graft_deploy_smoke}
mkdir -p "$OUT"

echo "[deploy-smoke] packaging..."
sbt -batch package >"$OUT/package.log" 2>&1
test -f "$JAR" || { echo "[deploy-smoke] jar not found: $JAR"; exit 1; }

run_mode() { # $1 = tag, $2 = master
  local tag=$1 master=$2
  local work
  work=$(mktemp -d "/tmp/graft_deploy_${tag}_XXXX")
  echo "[deploy-smoke] $tag: spark-submit --master $master"
  "$SPARK_HOME/bin/spark-submit" \
    --class graft.DeploySmoke \
    --master "$master" \
    --driver-memory 4g \
    --conf spark.executor.memory=1g \
    --conf spark.ui.enabled=false \
    "$JAR" "$SF" "$work" \
    >"$OUT/$tag.out" 2>"$OUT/$tag.err"
  rm -rf "$work"
  grep '"metric":"deploy_smoke"' "$OUT/$tag.out" >"$OUT/$tag.json"
  cat "$OUT/$tag.json"
}

run_mode local "local[4]"
run_mode cluster "local-cluster[2,2,1536]"

python3 - "$OUT/local.json" "$OUT/cluster.json" <<'EOF'
import json, sys
a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
errs = []
for k in ("q01_hash", "stream_hash", "q01_rows", "stream_rows"):
    if a[k] != b[k]:
        errs.append(f"{k}: local={a[k]} cluster={b[k]}")
for side, j in (("local", a), ("cluster", b)):
    if not j["stream_equals_batch"]:
        errs.append(f"{side}: stream != batch twin")
    if j["q01_rows"] == 0 or j["stream_rows"] == 0:
        errs.append(f"{side}: zero rows")
if errs:
    print("[deploy-smoke] MISMATCH:\n  " + "\n  ".join(errs))
    sys.exit(1)
print(f"[deploy-smoke] OK: local[4] == local-cluster[2,2] "
      f"(q01 {a['q01_rows']} rows {a['q01_hash'][:12]}..., "
      f"stream {a['stream_rows']} rows {a['stream_hash'][:12]}...)")
EOF
