#!/usr/bin/env bash
# Canonical bench measurement (BASELINE.md "Bench-noise measurement
# protocol"): load-gate the machine, run graft.Bench TWICE in fresh
# JVMs, keep both raw JSON lines, and emit a min-merged per-query board.
#
# usage: tools/bench2.sh <sfDir> <outPrefix> [SPARK_GRAFT_ONLY]
#   writes <outPrefix>.run1.json, <outPrefix>.run2.json, <outPrefix>.min.json
set -euo pipefail
SF="${1:?sfDir}"
OUT="${2:?outPrefix}"
ONLY="${3:-}"

# r15 shipped a committed 0-byte run2 after an interrupted pair: clean up
# partial outputs on ANY non-success exit so an aborted pair can never
# leave a truncated/empty record behind for a later commit to pick up.
CLEAN=0
cleanup() {
  if [ "$CLEAN" -ne 1 ]; then
    for f in "$OUT.run1.json" "$OUT.run2.json" "$OUT.min.json"; do
      if [ -e "$f" ] && ! [ -s "$f" ]; then rm -f "$f"; echo "removed empty partial $f" >&2; fi
    done
    # an interrupted run leaves the CURRENT run file complete-or-absent
    # (grep writes the single line atomically enough), but the min board
    # must never survive a failed pair
    [ -e "$OUT.min.json" ] && [ "$DONE_MERGE" != 1 ] && rm -f "$OUT.min.json" || true
  fi
}
DONE_MERGE=0
trap cleanup EXIT INT TERM

load1() { cut -d' ' -f1 /proc/loadavg; }
gate() {
  # the 1-min loadavg needs ~3-5 min to decay after our OWN previous
  # run — settle-wait (up to 10 min) before declaring the machine busy
  for _ in $(seq 1 40); do
    L=$(load1)
    if python3 -c "import sys; sys.exit(0 if float('$L') < 4.0 else 1)"; then
      echo "load gate ok: $L"
      return 0
    fi
    sleep 15
  done
  echo "load gate FAILED: 1-min load $(load1) >= 4.0 for 10 min — refusing to record" >&2
  exit 3
}

run() {
  local n="$1"
  gate
  local pre post
  pre=$(load1)
  # grep -m1 (not `grep | head -1`): under pipefail, head closing the pipe
  # after line 1 would kill grep with SIGPIPE (exit 141) and abort the
  # script, losing a completed multi-minute run
  if [ -n "$ONLY" ]; then
    SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_ONLY="$ONLY" sbt -batch "runMain graft.Bench" 2>/dev/null |
      grep -m1 -E '^\{"metric"' > "$OUT.run$n.json"
  else
    SPARK_GRAFT_SF_DIR="$SF" sbt -batch "runMain graft.Bench" 2>/dev/null |
      grep -m1 -E '^\{"metric"' > "$OUT.run$n.json"
  fi
  [ -s "$OUT.run$n.json" ] || { echo "run $n produced no metric line" >&2; exit 4; }
  post=$(load1)
  echo "run $n done (load $pre -> $post): $(head -c 120 "$OUT.run$n.json")"
}

run 1
run 2

python3 - "$OUT" <<'EOF'
import json, sys
out = sys.argv[1]
a = json.load(open(f"{out}.run1.json"))
b = json.load(open(f"{out}.run2.json"))
qa, qb = a["queries"], b["queries"]
# records self-describe their warmup state (Bench.scala); a NOWARMUP run
# is never a valid half of a canonical board
for n, r in (("run1", a), ("run2", b)):
    if r.get("warmup") is False:
        sys.exit(f"REFUSING to min-merge: {n} ran with SPARK_GRAFT_NOWARMUP")
# a canonical record must not silently drop a query that errored or ran
# in only one JVM: fail loudly instead of understating the total
errs = {**{f"run1:{k}": v for k, v in (a.get("errors") or {}).items()},
        **{f"run2:{k}": v for k, v in (b.get("errors") or {}).items()}}
if errs:
    sys.exit(f"REFUSING to min-merge: bench errors {errs}")
dropped = sorted(set(qa) ^ set(qb))
if dropped:
    sys.exit(f"REFUSING to min-merge: queries present in only one run: {dropped}")
merged = {k: min(qa[k], qb[k]) for k in qa if k in qb}
rec = {"metric": "total", "value": sum(merged.values()), "unit": "sec",
       "protocol": "min-of-2-fresh-jvm (BASELINE.md)", "sf": a["sf"],
       "run_totals": [a["value"], b["value"]],
       "queries": dict(sorted(merged.items()))}
json.dump(rec, open(f"{out}.min.json", "w"), indent=1)
print(f"min board: {sum(merged.values()):.1f}s over {len(merged)} queries "
      f"(runs {a['value']:.1f} / {b['value']:.1f})")
EOF
DONE_MERGE=1
CLEAN=1
