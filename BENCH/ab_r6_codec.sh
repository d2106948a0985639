#!/bin/bash
# Round-6 IO-codec A/B: zstd vs lz4 for shuffle/broadcast/spill
# (GRAFT_IO_CODEC -> spark.io.compression.codec). Hypothesis: the crawl
# regime is DRAM-bandwidth-bound at 32 threads (ladder attribution,
# rounds 3-6) - a denser codec trades ALU (abundant) for bytes through
# the memory system (scarce). Interleaved pairs, ladder protocol:
# 600k hosts, sf0.1, warm=1, tmpfs, fresh store per run, min-of-2
# crawl reps inside each Bench invocation.
set -x
cd /root/repo
run() {
  local codec=$1 label=$2
  rm -rf /tmp/graft-bench-crawl* /dev/shm/graft* /dev/shm/blockmgr-* /dev/shm/spark-* 2>/dev/null
  (SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 GRAFT_BENCH_HOSTS=600000 GRAFT_BENCH_ROUNDS=3 \
  SPARK_DRIVER_MEM=48g SPARK_GRAFT_CPUS=32 GRAFT_BENCH_PARTITIONS=32 \
  GRAFT_BENCH_WARM_ROUNDS=1 GRAFT_JVM_OPTS="-Djava.io.tmpdir=/dev/shm" \
  GRAFT_IO_CODEC=$codec \
  GRAFT_BENCH_OUT=/root/repo/BENCH/r6_codec_${label}.json \
  sbt -batch "runMain graft.Bench") > /root/repo/BENCH/r6_codec_${label}.log 2>&1
  python3 -c "import json;d=json.load(open('/root/repo/BENCH/r6_codec_${label}.json'));c=d['crawl'];print('$label',c['seconds'],c['urls_per_sec'],c['cpu_seconds'],'canary',c['canary_sec'])"
}
run zstd zstd1
run lz4  lz41
run zstd zstd2
run lz4  lz42
echo CODEC_AB_DONE
