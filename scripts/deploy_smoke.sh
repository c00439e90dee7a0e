#!/usr/bin/env bash
# Deploy-packaging smoke (VERDICT r14 item 4 + r15 item 3): prove the PACKAGED
# jar runs under spark-submit — `sbt package` + submit, no sbt runtime — in
#   local[4]               (single-JVM, the harness's usual shape),
#   local-cluster[2,2,..]  (REAL multi-process executors: closures, Encoders,
#                           the Catalyst extensions, DSv2 sources and state
#                           stores all cross a serialization boundary), and
#   spark://127.0.0.1:7077 (a REAL standalone cluster manager: master + worker
#                           daemons on loopback — the submit/driver/worker wire
#                           a user's actual cluster exercises, incl. executor
#                           launch via the worker process and app registration),
# then assert all modes produced IDENTICAL result hashes (and that each
# mode's streaming resume matched its batch twin internally — DeploySmoke
# exits nonzero otherwise).
#
# This is the offline stand-in for a real multi-host cluster: the repo's only
# runtime deps are Spark's own jars, so the same invocation works on YARN /
# k8s by swapping --master (see README "Running on a cluster").
# GRAFT_DEPLOY_SKIP_STANDALONE=1 skips mode 3 (e.g. port-restricted boxes).
set -euo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/root/testdata/sf0.001}
SPARK_HOME=${SPARK_HOME:-/opt/spark}
OUT=${GRAFT_DEPLOY_OUT:-/tmp/graft_deploy_smoke}
mkdir -p "$OUT"

echo "[deploy-smoke] packaging..."
sbt -batch package >"$OUT/package.log" 2>&1
# glob, don't hard-pin: a version bump in build.sbt must not silently break
# the smoke (ADVICE r15). Newest-by-mtime, never lexicographic: after a
# version bump a stale previous-version jar can sort first and the smoke
# would silently validate old code (ADVICE r16). `|| true` keeps the
# substitution from aborting under `set -e` when no jar exists, so the
# friendly diagnostic below is reachable (ADVICE r16).
JAR=$(ls -t target/scala-2.13/*.jar 2>/dev/null | grep -v -- '-sources\|-javadoc' | head -1 || true)
test -n "$JAR" -a -f "$JAR" || { echo "[deploy-smoke] no jar under target/scala-2.13"; exit 1; }
N_JARS=$(ls target/scala-2.13/*.jar 2>/dev/null | grep -cv -- '-sources\|-javadoc' || true)
if [ "$N_JARS" != "1" ]; then
  echo "[deploy-smoke] WARNING: $N_JARS candidate jars under target/scala-2.13; using newest: $JAR"
fi
echo "[deploy-smoke] jar: $JAR"

run_mode() { # $1 = tag, $2 = master, rest = extra spark-submit conf args
  local tag=$1 master=$2; shift 2
  local work launcher
  work=$(mktemp -d "/tmp/graft_deploy_${tag}_XXXX")
  # mode 3 (standalone) submits THROUGH THE OPERATOR CLI (`graft submit`,
  # VERDICT r16 task 2) — the path a real operator takes to a real cluster
  # manager; the other modes keep raw spark-submit so a CLI regression can
  # never mask (or be masked by) a packaging regression.
  if [ "$tag" = "standalone" ]; then
    launcher=(scripts/graft submit)
    echo "[deploy-smoke] $tag: graft submit --master $master"
  else
    launcher=("$SPARK_HOME/bin/spark-submit")
    echo "[deploy-smoke] $tag: spark-submit --master $master"
  fi
  "${launcher[@]}" \
    --class graft.DeploySmoke \
    --master "$master" \
    --driver-memory 4g \
    --conf spark.executor.memory=1g \
    --conf spark.ui.enabled=false \
    "$@" \
    "$JAR" "$SF" "$work" \
    >"$OUT/$tag.out" 2>"$OUT/$tag.err"
  rm -rf "$work"
  grep '"metric":"deploy_smoke"' "$OUT/$tag.out" >"$OUT/$tag.json"
  cat "$OUT/$tag.json"
}

run_mode local "local[4]"
run_mode cluster "local-cluster[2,2,1536]"

MODES=("$OUT/local.json" "$OUT/cluster.json")

if [ "${GRAFT_DEPLOY_SKIP_STANDALONE:-0}" != "1" ]; then
  # ---- mode 3: real standalone master + worker daemons on loopback --------
  # Daemon logs/pids go to /tmp (the sandbox must not write under /opt/spark).
  export SPARK_LOG_DIR="$OUT/daemon-logs" SPARK_PID_DIR="$OUT/daemon-pids"
  export SPARK_MASTER_HOST=127.0.0.1 SPARK_LOCAL_IP=127.0.0.1
  export SPARK_IDENT_STRING=graftsmoke
  mkdir -p "$SPARK_LOG_DIR" "$SPARK_PID_DIR"
  # fail fast if the ports are already bound (ADVICE r16): start-master fails
  # quietly to a log, and the registration probe would poll whatever process
  # already holds the web-UI port — 60 s of hang or probing an unrelated
  # server. Ports are derived from $$ so concurrent smokes can't collide.
  MASTER_PORT=$((7077 + $$ % 400))
  MASTER_UI_PORT=$((8091 + $$ % 400))
  WORKER_UI_PORT=$((8591 + $$ % 400))
  for p in "$MASTER_PORT" "$MASTER_UI_PORT" "$WORKER_UI_PORT"; do
    if python3 -c "import socket,sys; s=socket.socket(); rc=s.connect_ex(('127.0.0.1', int(sys.argv[1]))); s.close(); sys.exit(0 if rc else 1)" "$p"; then
      : # closed (connect refused) = free
    else
      echo "[deploy-smoke] port $p already bound; refusing to start daemons"
      exit 1
    fi
  done
  cleanup_daemons() {
    "$SPARK_HOME/sbin/stop-worker.sh" >/dev/null 2>&1 || true
    "$SPARK_HOME/sbin/stop-master.sh" >/dev/null 2>&1 || true
  }
  trap cleanup_daemons EXIT
  echo "[deploy-smoke] standalone: starting master + worker on loopback (port $MASTER_PORT)"
  "$SPARK_HOME/sbin/start-master.sh" --port "$MASTER_PORT" --webui-port "$MASTER_UI_PORT" \
    >"$OUT/master-start.log" 2>&1
  # one 4-core worker; spark.executor.cores=2 below carves it into 2 executors,
  # mirroring local-cluster[2,2]
  "$SPARK_HOME/sbin/start-worker.sh" "spark://127.0.0.1:$MASTER_PORT" \
    --cores 4 --memory 4g --webui-port "$WORKER_UI_PORT" >"$OUT/worker-start.log" 2>&1
  # wait until the worker has REGISTERED with the master (the master's JSON
  # endpoint reports alive workers) — a submit before registration would sit
  # in WAITING and still pass, but a registration failure should fail fast,
  # surfacing the daemon logs (ADVICE r16: a quiet master-start failure was
  # otherwise invisible)
  if ! python3 - "$MASTER_UI_PORT" <<'EOF'
import json, time, urllib.request, sys
port = sys.argv[1]
for _ in range(60):
    try:
        j = json.load(urllib.request.urlopen(f"http://127.0.0.1:{port}/json/", timeout=2))
        if sum(1 for w in j.get("workers", []) if w.get("state") == "ALIVE") >= 1:
            print("[deploy-smoke] worker registered"); sys.exit(0)
    except Exception:
        pass
    time.sleep(1)
print("[deploy-smoke] worker never registered with master"); sys.exit(1)
EOF
  then
    echo "[deploy-smoke] --- master-start.log / newest daemon logs follow ---"
    cat "$OUT/master-start.log" || true
    tail -n 40 "$SPARK_LOG_DIR"/*.out 2>/dev/null || true
    exit 1
  fi
  run_mode standalone "spark://127.0.0.1:$MASTER_PORT" \
    --conf spark.executor.cores=2 --conf spark.cores.max=4
  cleanup_daemons
  trap - EXIT
  MODES+=("$OUT/standalone.json")
else
  echo "[deploy-smoke] standalone mode SKIPPED (GRAFT_DEPLOY_SKIP_STANDALONE=1)"
fi

python3 - "${MODES[@]}" <<'EOF'
import json, sys
sides = [(p.rsplit("/", 1)[-1].removesuffix(".json"), json.load(open(p)))
         for p in sys.argv[1:]]
ref_name, ref = sides[0]
errs = []
for name, j in sides[1:]:
    for k in ("q01_hash", "stream_hash", "q01_rows", "stream_rows"):
        if ref[k] != j[k]:
            errs.append(f"{k}: {ref_name}={ref[k]} {name}={j[k]}")
for name, j in sides:
    if not j["stream_equals_batch"]:
        errs.append(f"{name}: stream != batch twin")
    if j["q01_rows"] == 0 or j["stream_rows"] == 0:
        errs.append(f"{name}: zero rows")
if errs:
    print("[deploy-smoke] MISMATCH:\n  " + "\n  ".join(errs))
    sys.exit(1)
print(f"[deploy-smoke] OK: {' == '.join(n for n, _ in sides)} "
      f"(q01 {ref['q01_rows']} rows {ref['q01_hash'][:12]}..., "
      f"stream {ref['stream_rows']} rows {ref['stream_hash'][:12]}...)")
EOF
