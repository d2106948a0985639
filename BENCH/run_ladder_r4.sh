#!/bin/bash
# Round-4 exclusive ladder + same-day A/B vs the r3 commit (dcc4da7).
# Protocol identical to BENCH/BASELINE.md (600k hosts, sf0.1, warm=1, tmpfs).
set -x
cd /root/repo
run() {
  local cpus=$1 label=$2 dir=${3:-/root/repo}
  rm -rf /tmp/graft-bench-crawl* /dev/shm/graft* /dev/shm/blockmgr-* /dev/shm/spark-* 2>/dev/null
  (cd "$dir" && \
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 GRAFT_BENCH_HOSTS=600000 GRAFT_BENCH_ROUNDS=3 \
  SPARK_DRIVER_MEM=48g SPARK_GRAFT_CPUS=$cpus GRAFT_BENCH_PARTITIONS=$cpus \
  GRAFT_BENCH_WARM_ROUNDS=1 GRAFT_JVM_OPTS="-Djava.io.tmpdir=/dev/shm" \
  GRAFT_BENCH_OUT=/root/repo/BENCH/r4_${label}.json \
  sbt -batch "runMain graft.Bench") > /root/repo/BENCH/r4_${label}.log 2>&1
  echo "== $label done: $(tail -c 400 /root/repo/BENCH/r4_${label}.json 2>/dev/null)"
}
run 32 ladder32_tmpfs
run 8  ladder8_tmpfs
run 2  ladder2_tmpfs
# same-day A/B: round-3 commit in a worktree
git worktree add -f /tmp/r3wt dcc4da7 >/dev/null 2>&1 || true
run 32 ab_r3commit_32 /tmp/r3wt
git worktree remove --force /tmp/r3wt
echo ALL_DONE
