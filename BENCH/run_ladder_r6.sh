#!/bin/bash
# Round-6 exclusive ladder on HEAD (post-revert). Protocol identical to
# rounds 3-5: 600k hosts, sf0.1, warm=1, tmpfs, fresh store per run;
# Bench itself runs 2 crawl reps per invocation and cites the min, and
# (new this round) 2 reps per headline query + the recall block.
set -x
cd /root/repo
run() {
  local cpus=$1 label=$2
  rm -rf /tmp/graft-bench-crawl* /dev/shm/graft* /dev/shm/blockmgr-* /dev/shm/spark-* 2>/dev/null
  (SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 GRAFT_BENCH_HOSTS=600000 GRAFT_BENCH_ROUNDS=3 \
  SPARK_DRIVER_MEM=48g SPARK_GRAFT_CPUS=$cpus GRAFT_BENCH_PARTITIONS=$cpus \
  GRAFT_BENCH_WARM_ROUNDS=1 GRAFT_JVM_OPTS="-Djava.io.tmpdir=/dev/shm" \
  GRAFT_BENCH_OUT=/root/repo/BENCH/r6_${label}.json \
  sbt -batch "runMain graft.Bench") > /root/repo/BENCH/r6_${label}.log 2>&1
  python3 -c "import json;d=json.load(open('/root/repo/BENCH/r6_${label}.json'));c=d['crawl'];print('$label',c['seconds'],c['urls_per_sec'],c['cpu_seconds'],'canary',c['canary_sec'])"
}
run 32 ladder32
run 8  ladder8
run 2  ladder2
run 32 ladder32b
echo LADDER6_DONE
