#!/bin/bash
# Round-18 scale-gate pipeline (run AFTER a clean-window bench):
#   1. full-board Verify + check at sf1  -> SF1_GATE.json
#   2. full-board Verify + check at sf3  -> SF3_GATE.json — now at FULL
#      breadth with ZERO exclusions: q173's bounded-scratch chunked
#      regime (engine) + per-statement oracle script keep both engines
#      inside this box's disk at 30x full precision (Q173_SF3_CERT.json
#      records the measured peaks); give its oracle a generous override.
#   3. determinism probe: two independent Verify runs at sf0.01 diffed
#   4. partition-invariance probe: the board at 200 shuffle partitions
#      diffed against the 32-partition run (round-18; 0 diffs expected)
#   5. memory-pressure gate: the dedup family at sf1 under a 4g JVM,
#      fresh warehouse, results hash-checked (SCALE_MEM.json)
# Sequential on purpose: each stage wants the whole machine, and the
# heavy DuckDB legs and Spark legs must never share the disk (the
# round-18 oracle restructure exists because they once did).
set -x
cd /root/repo

sbt -batch "runMain graft.Verify /tmp/sf1 /tmp/v18_sf1" \
  > /tmp/v18_sf1.log 2>&1
python3 tools/check_scale_par.py /tmp/sf1 /tmp/v18_sf1 1800 SF1_GATE.json 4 \
  q173_cf_neighbors=5400 \
  > /tmp/gate_sf1.log 2>&1

sbt -batch "runMain graft.Verify /tmp/sf3 /tmp/v18_sf3" \
  > /tmp/v18_sf3.log 2>&1
python3 tools/check_scale_par.py /tmp/sf3 /tmp/v18_sf3 3600 SF3_GATE.json 4 \
  q173_cf_neighbors=14400 \
  > /tmp/gate_sf3.log 2>&1

sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/v18_det_a" \
  > /tmp/v18_det_a.log 2>&1
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/v18_det_b" \
  > /tmp/v18_det_b.log 2>&1
python3 tools/det_compare.py /tmp/v18_det_a /tmp/v18_det_b \
  > /tmp/det_compare.log 2>&1

SPARK_GRAFT_SHUFFLE_PARTITIONS=200 \
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/v18_p200" \
  > /tmp/v18_p200.log 2>&1
python3 tools/det_compare.py /tmp/v18_det_a /tmp/v18_p200 \
  > /tmp/p200_compare.log 2>&1

SPARK_DRIVER_MEM=4g sbt -batch \
  "runMain graft.tools.ScaleMem /tmp/sf1 /tmp/scalemem_sf1" \
  > /tmp/scalemem.log 2>&1
python3 tools/check.py /tmp/sf1 /tmp/scalemem_sf1 \
  > /tmp/scalemem_check.log 2>&1

echo "PIPELINE DONE sf1=$(grep -c OK /tmp/gate_sf1.log) sf3=$(grep -c OK /tmp/gate_sf3.log)"
