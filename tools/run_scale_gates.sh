#!/bin/bash
# Round-17 scale-gate pipeline (run AFTER a clean-window bench):
#   1. full-board Verify + check at sf1  -> SF1_GATE.json
#   2. full-board Verify + check at sf3  -> SF3_GATE.json (the round-16
#      verdict demand: zero exclusions at genuine full breadth — the
#      heavy dedup oracle chains are inverted-index-shaped now, and the
#      legit-quadratic q173 gets the wall clock it actually needs)
#   3. determinism probe: two independent Verify runs at sf0.01 diffed
# Sequential on purpose: each stage wants the whole machine.
set -x
cd /root/repo

sbt -batch "runMain graft.Verify /tmp/sf1 /tmp/v17_sf1" \
  > /tmp/v17_sf1.log 2>&1
python3 tools/check_scale.py /tmp/sf1 /tmp/v17_sf1 1800 SF1_GATE.json \
  > /tmp/gate_sf1.log 2>&1

sbt -batch "runMain graft.Verify /tmp/sf3 /tmp/v17_sf3" \
  > /tmp/v17_sf3.log 2>&1
python3 tools/check_scale.py /tmp/sf3 /tmp/v17_sf3 3600 SF3_GATE.json \
  > /tmp/gate_sf3.log 2>&1

sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/v17_det_a" \
  > /tmp/v17_det_a.log 2>&1
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/v17_det_b" \
  > /tmp/v17_det_b.log 2>&1
python3 tools/det_compare.py /tmp/v17_det_a /tmp/v17_det_b \
  > /tmp/det_compare.log 2>&1

echo "PIPELINE DONE sf1=$(grep -c OK /tmp/gate_sf1.log) sf3=$(grep -c OK /tmp/gate_sf3.log)"
