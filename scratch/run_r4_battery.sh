#!/bin/bash
# Round-4 TPU measurement battery, run sequentially once the pool is alive.
# Each stage appends to /tmp/r4_battery.log.
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/r4_battery.log
cd /root/repo
{
  echo "=== battery start $(date -u +%H:%M:%S) ==="
  echo "--- 1. tpu_smoke (on-device kernel gate, incl. compaction change)"
  python tools/tpu_smoke.py
  echo "--- 2. rebuild decomposition after compaction (prof_rebuild_r5)"
  python scratch/prof_rebuild_r5.py
  echo "--- 3. 1M spb sweep"
  python scratch/sweep_1m_spb.py
  echo "--- 4. 32k spb sweep"
  python scratch/sweep_32k_spb.py
  echo "--- 5. headline bench"
  python bench.py
  echo "=== battery done $(date -u +%H:%M:%S) ==="
} >> "$LOG" 2>&1
