#!/bin/bash
# Same-build interleaved A/B for the seen-Bloom overlap (Loop.scala):
# par = bloom fold launched before the writes (overlapped),
# seq = GRAFT_SEQ_BLOOM=1 restores the serial order.
# Driver protocol: sf0.1, local[32], 200k hosts, REPS=2, min-wall rule.
for pair in 1 2; do
  for side in par seq; do
    rm -rf /tmp/graft-bench-crawl* 2>/dev/null
    env="";  [ $side = seq ] && env="GRAFT_SEQ_BLOOM=1"
    echo "=== pair$pair $side ==="
    (eval SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 GRAFT_BENCH_PARTITIONS=32 $env GRAFT_BENCH_OUT=/tmp/abb_${side}${pair}.json sbt -batch '"runMain graft.Bench"' 2>&1 | tail -1 > /dev/null)
    python3 -c "
import json
d=json.load(open('/tmp/abb_${side}${pair}.json'))
c=d['crawl']
print('${side}${pair}:', c['urls_per_sec'], '@', c['cpu_seconds'], 'wall', c['seconds'], 'canaries', c['canary_runs'], 'reps', [(r['seconds'], r['urls_per_sec']) for r in c['reps']])"
  done
done
