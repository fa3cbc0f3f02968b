#!/bin/bash
# Benchmark sweep (reference reproducing.sh): 3 repeated runs over
# TUM x5, Replica x8, ScanNet x6. Logs tee'd to log/<dataset>/<scene>_N.log.
set -u
RUNS=${RUNS:-3}
mkdir -p log/TUM_RGBD log/Replica log/ScanNet

run_scene () {
  local cfg=$1 ds=$2 scene=$3 i=$4
  echo ">>> $ds/$scene run $i"
  python run_slam.py "$cfg" \
    --output_path "output/$ds/${scene}_$i" --seed "$i" \
    2>&1 | tee "log/$ds/${scene}_$i.log"
}

for i in $(seq 0 $((RUNS-1))); do
  for s in fr1_desk fr1_desk2 fr1_room fr2_xyz fr3_office; do
    run_scene configs/TUM_RGBD/$s.yaml TUM_RGBD $s $i
  done
  for s in room0 room1 room2 office0 office1 office2 office3 office4; do
    run_scene configs/Replica/$s.yaml Replica $s $i
  done
  for s in scene0000_00 scene0059_00 scene0106_00 scene0169_00 scene0181_00 scene0207_00; do
    run_scene configs/ScanNet/$s.yaml ScanNet $s $i
  done
done
