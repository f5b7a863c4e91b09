#!/bin/bash
# Round-19 scale-gate pipeline (round-18 verdict item 1: regenerate the
# SF1/SF3 gates on the ROUND-19 TREE with q173 run INSIDE the sf3 gate
# under the chunked regime — excluded_by_hardware absent):
#   1. full-board Verify + check at sf1  -> SF1_GATE.json
#   2. full-board Verify + check at sf3  -> SF3_GATE.json (q173 inside,
#      generous oracle override; its per-statement chunk script keeps
#      DuckDB's spill bounded, the engine's chunked regime keeps Spark's
#      scratch at the configured budget)
# Sequential on purpose: the heavy DuckDB legs and Spark legs must never
# share the disk. Probes (determinism, partition invariance, ScaleMem)
# run separately after the gates.
set -x
cd /root/repo

sbt -batch "runMain graft.Verify /tmp/sf1 /tmp/v19_sf1" \
  > /tmp/v19_sf1.log 2>&1
python3 tools/check_scale_par.py /tmp/sf1 /tmp/v19_sf1 1800 SF1_GATE.json 4 \
  q173_cf_neighbors=5400 \
  > /tmp/gate_sf1_r19.log 2>&1

sbt -batch "runMain graft.Verify /tmp/sf3 /tmp/v19_sf3" \
  > /tmp/v19_sf3.log 2>&1
python3 tools/check_scale_par.py /tmp/sf3 /tmp/v19_sf3 3600 SF3_GATE.json 4 \
  q173_cf_neighbors=14400 \
  > /tmp/gate_sf3_r19.log 2>&1

echo "GATES DONE"
