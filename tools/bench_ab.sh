#!/usr/bin/env bash
# Paired same-session A/B bench (BASELINE.md protocol rule 7): settle
# whether a cross-round board shift is code or host drift by running the
# OLD commit and the CURRENT tree back-to-back, fresh JVMs, identical
# query subset, on a load-gated machine. The paired ratio cancels host
# state — only a shift that survives this is a code regression.
#
# usage: tools/bench_ab.sh <oldCommit> <sfDir> <onlyList> [outPrefix]
#   e.g. tools/bench_ab.sh r15-close /root/testdata/sf0.1 q_asof_join,t_tfidf_topk
# writes <outPrefix>.old.json, <outPrefix>.new.json and prints a
# per-query ratio table (old/new per query + totals).
set -euo pipefail
OLD="${1:?oldCommit}"
SF="${2:?sfDir}"
ONLY="${3:?onlyList (comma-separated SPARK_GRAFT_ONLY subset)}"
OUT="${4:-BENCH_AB}"

REPO="$(git rev-parse --show-toplevel)"
cd "$REPO"
git diff --quiet || { echo "refusing: working tree dirty (commit first — the A/B checks out $OLD in a worktree, the CURRENT side must be a commit too)" >&2; exit 2; }

WT="$(mktemp -d /tmp/bench_ab.XXXXXX)"
cleanup() { git worktree remove --force "$WT" 2>/dev/null || true; rm -rf "$WT"; }
trap cleanup EXIT INT TERM
git worktree add --detach "$WT" "$OLD" >/dev/null

load1() { cut -d' ' -f1 /proc/loadavg; }
gate() {
  for _ in $(seq 1 40); do
    L=$(load1)
    python3 -c "import sys; sys.exit(0 if float('$L') < 4.0 else 1)" && { echo "load gate ok: $L"; return 0; }
    sleep 15
  done
  echo "load gate FAILED: $(load1) >= 4.0 for 10 min" >&2; exit 3
}

run_side() { # dir outfile
  local dir="$1" out="$2"
  gate
  ( cd "$dir" && SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_ONLY="$ONLY" \
      sbt -batch "runMain graft.Bench" 2>/dev/null ) |
    grep -m1 -E '^\{"metric"' > "$out"
  [ -s "$out" ] || { echo "side $dir produced no metric line" >&2; exit 4; }
  echo "side done: $(head -c 100 "$out")"
}

# old first, then new, back-to-back — one session, one machine state
run_side "$WT" "$REPO/$OUT.old.json"
run_side "$REPO" "$REPO/$OUT.new.json"

python3 - "$REPO/$OUT" <<'EOF'
import json, sys
out = sys.argv[1]
a = json.load(open(f"{out}.old.json"))  # previous round's code
b = json.load(open(f"{out}.new.json"))  # current tree
qa, qb = a["queries"], b["queries"]
common = sorted(set(qa) & set(qb))
print(f"{'query':34} {'old':>8} {'new':>8} {'new/old':>8}")
for q in common:
    print(f"{q:34} {qa[q]:8.2f} {qb[q]:8.2f} {qb[q]/qa[q]:8.2f}")
ta, tb = sum(qa[q] for q in common), sum(qb[q] for q in common)
print(f"{'TOTAL':34} {ta:8.2f} {tb:8.2f} {tb/ta:8.2f}")
print("verdict hint: paired ratio ~1.00 => board shift was host drift;"
      " a reproduced per-query ratio past ±15% here is REAL -> bisect")
EOF
