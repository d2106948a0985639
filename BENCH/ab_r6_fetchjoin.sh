#!/bin/bash
# Round-6 interleaved A/B: corpus partitioned-once fetch join (03f2e53)
# vs same build without it (2a6150b). Both sides run from worktrees with
# the IDENTICAL pre-round-6 Bench, isolating the crawl-path change.
# Pair 3 records JFR for window-robust allocation comparison.
set -x
bench() {
  local label=$1 dir=$2 jfr=$3
  rm -rf /tmp/graft-bench-crawl* /dev/shm/graft* /dev/shm/blockmgr-* /dev/shm/spark-* 2>/dev/null
  local jvm="-Djava.io.tmpdir=/dev/shm"
  if [ -n "$jfr" ]; then
    jvm="$jvm -XX:StartFlightRecording:filename=/root/repo/BENCH/jfr6_${label}.jfr,settings=profile,maxsize=800m"
  fi
  (cd $dir && \
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 GRAFT_BENCH_HOSTS=600000 GRAFT_BENCH_ROUNDS=3 \
  SPARK_DRIVER_MEM=48g SPARK_GRAFT_CPUS=32 GRAFT_BENCH_PARTITIONS=32 \
  GRAFT_BENCH_WARM_ROUNDS=1 GRAFT_BENCH_REPS=1 GRAFT_JVM_OPTS="$jvm" \
  GRAFT_BENCH_OUT=/root/repo/BENCH/ab6_${label}.json \
  sbt -batch "runMain graft.Bench") > /root/repo/BENCH/ab6_${label}.log 2>&1
  python3 -c "import json;d=json.load(open('/root/repo/BENCH/ab6_${label}.json'));c=d['crawl'];print('$label',c['seconds'],c['urls_per_sec'],c['cpu_seconds'],'canary',c['canary_sec'])"
}
git -C /root/repo worktree remove --force /tmp/fjwt 2>/dev/null
git -C /root/repo worktree remove --force /tmp/prewt 2>/dev/null
git -C /root/repo worktree add -f /tmp/fjwt 03f2e53 >/dev/null 2>&1
git -C /root/repo worktree add -f /tmp/prewt 2a6150b >/dev/null 2>&1
bench fj1 /tmp/fjwt
bench pre1 /tmp/prewt
bench fj2 /tmp/fjwt
bench pre2 /tmp/prewt
bench fj3 /tmp/fjwt jfr
bench pre3 /tmp/prewt jfr
git -C /root/repo worktree remove --force /tmp/fjwt
git -C /root/repo worktree remove --force /tmp/prewt
echo AB6_DONE
