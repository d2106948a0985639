#!/bin/bash
set -x
run() {
  local label=$1 ref=$2
  rm -rf /tmp/graft-bench-crawl* /dev/shm/graft* /dev/shm/blockmgr-* /dev/shm/spark-* 2>/dev/null
  git worktree remove --force /tmp/bisectwt 2>/dev/null
  git -C /root/repo worktree add -f /tmp/bisectwt $ref >/dev/null 2>&1
  (cd /tmp/bisectwt && \
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 GRAFT_BENCH_HOSTS=600000 GRAFT_BENCH_ROUNDS=3 \
  SPARK_DRIVER_MEM=48g SPARK_GRAFT_CPUS=32 GRAFT_BENCH_PARTITIONS=32 \
  GRAFT_BENCH_WARM_ROUNDS=1 GRAFT_JVM_OPTS="-Djava.io.tmpdir=/dev/shm" \
  GRAFT_BENCH_OUT=/root/repo/BENCH/bisect_${label}.json \
  sbt -batch "runMain graft.Bench") > /root/repo/BENCH/bisect_${label}.log 2>&1
  python3 -c "import json;print('$label', json.load(open('/root/repo/BENCH/bisect_${label}.json'))['crawl'])"
}
run head_again 9ea7352
run urlbytes 9796c8b
run prefixseen a43899f
git worktree remove --force /tmp/bisectwt 2>/dev/null
echo BISECT_DONE
