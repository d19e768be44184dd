#!/bin/bash
# (r4) Capture-automation for the flaky axon tunnel; run detached:
#   nohup tools/bench_poll.sh >/dev/null 2>&1 & echo $! > /tmp/bench_poll.pid
# Logs to /tmp/*.log. Kill by PID file, never by pattern.
# Keep retrying bench.py until all 7 metrics are in the resume file,
# then capture the swin MFU-closure workloads. Detached; pid in
# /tmp/bench_poll.pid; log in /tmp/bench_poll.log.
cd /root/repo
LOG=/tmp/bench_poll.log
RF=/root/.cache/mst_bench_results.json
while true; do
  n=$(python3 -c "import bench;print(len(bench._valid_resume_entries()))" 2>/dev/null || echo 0)
  echo "$(date -u +%FT%T) resume has $n/7 metrics" >> "$LOG"
  if [ "$n" -ge 7 ]; then break; fi
  timeout 1500 python bench.py >> "$LOG" 2>&1
  echo "$(date -u +%FT%T) bench attempt rc=$?" >> "$LOG"
  sleep 30
done
echo "$(date -u +%FT%T) BENCH 7/7 DONE" >> "$LOG"
if python3 -c "import json;d=json.load(open('MFU_CLOSURE.json'));import sys;sys.exit(0 if 'swin224_train' in d['workloads'] and 'swin224_eval' in d['workloads'] else 1)" 2>/dev/null; then
  echo "$(date -u +%FT%T) MFU swin already present" >> "$LOG"
else
  timeout 1800 python tools/mfu_closure.py swin swin_eval >> "$LOG" 2>&1
  echo "$(date -u +%FT%T) mfu_closure swin rc=$?" >> "$LOG"
fi
echo "$(date -u +%FT%T) POLLER EXIT" >> "$LOG"
