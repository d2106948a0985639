#!/bin/bash
set -x
bench() {
  local label=$1 dir=$2
  rm -rf /tmp/graft-bench-crawl* /dev/shm/graft* /dev/shm/blockmgr-* /dev/shm/spark-* 2>/dev/null
  (cd $dir && \
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 GRAFT_BENCH_HOSTS=600000 GRAFT_BENCH_ROUNDS=3 \
  SPARK_DRIVER_MEM=48g SPARK_GRAFT_CPUS=32 GRAFT_BENCH_PARTITIONS=32 \
  GRAFT_BENCH_WARM_ROUNDS=1 GRAFT_JVM_OPTS="-Djava.io.tmpdir=/dev/shm" \
  GRAFT_BENCH_OUT=/root/repo/BENCH/abp_${label}.json \
  sbt -batch "runMain graft.Bench") > /root/repo/BENCH/abp_${label}.log 2>&1
  python3 -c "import json;d=json.load(open('/root/repo/BENCH/abp_${label}.json'));print('$label',d['crawl']['urls_per_sec'],d['crawl']['cpu_seconds'],d['queries']['q01_pricing_summary'])"
}
git -C /root/repo worktree remove --force /tmp/ubwt 2>/dev/null
git -C /root/repo worktree add -f /tmp/ubwt 9796c8b >/dev/null 2>&1
for i in 1 2 3; do
  bench head$i /root/repo
  bench ub$i /tmp/ubwt
done
git -C /root/repo worktree remove --force /tmp/ubwt
echo PAIRS_DONE
