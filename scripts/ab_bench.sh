#!/bin/bash
# Interleaved A/B bench adjudication — the controlled methodology that
# settled the r12-vs-r10 driver-bench drift (SURVEY §6): run two built
# trees A,B,A,B,... on the same host so environment drift cancels, then
# compare per-query minima over all invocations of each side.
#
#   scripts/ab_bench.sh <treeA> <treeB> [rounds=3] [sfDir=/root/testdata/sf0.1] [cpus=32]
#
# Each tree must be compiled (target/scala-2.13/classes present — use a
# git worktree at the comparison commit and `sbt compile` in it). One
# JSON line per invocation is appended to ab_A.jsonl / ab_B.jsonl in the
# CWD; compare with:
#
#   python3 - <<'EOF'
#   import json
#   def best(p):
#       m = {}
#       for line in open(p):
#           for q, v in json.loads(line)['queries'].items():
#               m[q] = min(m.get(q, 1e9), v)
#       return m
#   a, b = best('ab_A.jsonl'), best('ab_B.jsonl')
#   common = sorted(set(a) & set(b))
#   sa, sb = sum(a[q] for q in common), sum(b[q] for q in common)
#   print(f"common={len(common)} A={sa:.1f}s B={sb:.1f}s ratio={sa/sb:.3f}")
#   for q in sorted(common, key=lambda q: a[q]-b[q])[-10:]:
#       print(f"  {q}: A={a[q]:.2f} B={b[q]:.2f}")
#   EOF
set -euo pipefail
A=$1; B=$2
ROUNDS=${3:-3}
export SPARK_GRAFT_SF_DIR=${4:-/root/testdata/sf0.1}
export SPARK_GRAFT_CPUS=${5:-32}
CP_SPARK="/opt/spark/jars/*"
run() {
  java -Xmx"${AB_XMX:-32g}" \
    $(for p in java.lang java.lang.invoke java.io java.net java.nio java.util \
               java.util.concurrent java.util.concurrent.atomic; do
        echo "--add-opens=java.base/$p=ALL-UNNAMED"; done) \
    --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
    --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
    --add-opens=java.base/sun.security.action=ALL-UNNAMED \
    --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
    -cp "$1/target/scala-2.13/classes:$CP_SPARK" graft.Bench 2>/dev/null \
    | tail -1 >> "$2"
}
rm -f ab_A.jsonl ab_B.jsonl
for i in $(seq 1 "$ROUNDS"); do
  echo "=== round $i A $(date +%T) load=$(cut -d' ' -f1 /proc/loadavg)"
  run "$A" ab_A.jsonl
  echo "=== round $i B $(date +%T) load=$(cut -d' ' -f1 /proc/loadavg)"
  run "$B" ab_B.jsonl
done
echo "DONE — compare ab_A.jsonl vs ab_B.jsonl (per-query min over $ROUNDS)"
