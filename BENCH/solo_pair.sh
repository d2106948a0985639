#!/bin/bash
set -x
bench() {
  local label=$1 dir=$2
  rm -rf /tmp/graft-bench-crawl* /dev/shm/graft* /dev/shm/blockmgr-* /dev/shm/spark-* 2>/dev/null
  (cd $dir && \
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 GRAFT_BENCH_HOSTS=600000 GRAFT_BENCH_ROUNDS=3 \
  SPARK_DRIVER_MEM=48g SPARK_GRAFT_CPUS=32 GRAFT_BENCH_PARTITIONS=32 \
  GRAFT_BENCH_WARM_ROUNDS=1 GRAFT_BENCH_REPS=1 GRAFT_JVM_OPTS="-Djava.io.tmpdir=/dev/shm" \
  GRAFT_BENCH_OUT=/root/repo/BENCH/solo_${label}.json \
  sbt -batch "runMain graft.Bench") > /root/repo/BENCH/solo_${label}.log 2>&1
  python3 -c "import json;d=json.load(open('/root/repo/BENCH/solo_${label}.json'));c=d['crawl'];print('$label',c['seconds'],c['urls_per_sec'],c['cpu_seconds'],'canary',c['canary_sec'])"
}
git -C /root/repo worktree remove --force /tmp/presolo 2>/dev/null
git -C /root/repo worktree add -f /tmp/presolo f5f267c >/dev/null 2>&1
bench s1 /root/repo
bench p1 /tmp/presolo
bench s2 /root/repo
bench p2 /tmp/presolo
git -C /root/repo worktree remove --force /tmp/presolo
echo SOLO_PAIR_DONE
