#!/bin/bash
# (r5) Opportunistic TPU task queue for flaky-tunnel rounds; run detached:
#   nohup tools/tpu_queue.sh >/dev/null 2>&1 & echo $! > /tmp/tpu_queue.pid
# Marker-gated chain: robustness artifact -> full bench at the CURRENT
# src_hash (the bench_done check validates per-entry src/workload hashes,
# so a package commit automatically forces a re-capture) -> per-family
# parity TPU children (disk-cached; cpu children prewarm separately) ->
# the merge-only-if-better recapture loop for the window-bound rows.
# Kill by PID file, never by pattern. QUEUE_BUDGET_S bounds the run.
cd /root/repo
LOG=/tmp/tpu_queue.log
DEADLINE=$(( $(date +%s) + ${QUEUE_BUDGET_S:-18000} ))
probe() {
  timeout 75 python3 -c "
import jax, jax.numpy as jnp
print(float(jnp.ones((8,8)).sum()))" >/dev/null 2>&1
}
bench_done() {
  python3 - <<'PY'
import json, sys
sys.path.insert(0, '/root/repo')
try:
    d = json.load(open('/root/.cache/mst_bench_results.json'))
    import bench
    cur = bench._src_hash()
except Exception:
    sys.exit(1)
need = ["unet256_train","swin224_train","swin224_eval","swin224_eval_device",
        "pretrain224_train","pretrain224_e2e_measured",
        "covidqu256_e2e_breakdown","covidqu256_e2e_measured","covidqu256_cli_epoch"]
ok = all(n in d and d[n].get("src_hash") == cur
         and d[n].get("workload_hash") == bench._workload_hash(n)
         for n in need)
sys.exit(0 if ok else 1)
PY
}
parity_done() {
  ls /tmp/traj_cache_${1}_tpu_f32_*.json >/dev/null 2>&1 && \
  ls /tmp/traj_cache_${1}_tpu_bf16_*.json >/dev/null 2>&1
}
while [ $(date +%s) -lt $DEADLINE ]; do
  if ! probe; then
    echo "$(date -u +%FT%T) tunnel down" >> "$LOG"; sleep 90; continue
  fi
  if ! grep -q '"ok": true' ROBUSTNESS_TPU.json 2>/dev/null; then
    echo "$(date -u +%FT%T) running robustness sweep" >> "$LOG"
    timeout 2700 python tools/robustness_tpu.py >> /tmp/robustness_tpu.log 2>&1
    echo "$(date -u +%FT%T) robustness rc=$?" >> "$LOG"
    continue
  fi
  if ! bench_done; then
    echo "$(date -u +%FT%T) running full bench" >> "$LOG"
    BENCH_BUDGET_S=3300 timeout 3500 python bench.py >> /tmp/bench_full_r5.log 2>&1
    echo "$(date -u +%FT%T) bench rc=$?" >> "$LOG"
    continue
  fi
  ran_parity=0
  for m in unet swin_unet resnet_attention_unet; do
    if ! parity_done $m; then
      echo "$(date -u +%FT%T) parity children for $m" >> "$LOG"
      TRAJ_MODELS=$m timeout 3000 python tools/parity_tpu.py >> /tmp/parity_r5.log 2>&1
      echo "$(date -u +%FT%T) parity $m rc=$?" >> "$LOG"
      ran_parity=1
      break
    fi
  done
  [ $ran_parity -eq 1 ] && continue
  echo "$(date -u +%FT%T) ALL QUEUE TASKS DONE - starting recapture loop" >> "$LOG"
  RECAP_TARGETS="swin224_eval,swin224_eval_device,pretrain224_e2e_measured,covidqu256_e2e_breakdown,covidqu256_e2e_measured,covidqu256_cli_epoch" \
  RECAP_BUDGET_S=$(( DEADLINE - $(date +%s) )) tools/recapture.sh
  break
done
echo "$(date -u +%FT%T) QUEUE EXIT" >> "$LOG"
