#!/bin/bash
# Retry loop for the r4d serving layout A/B: the tunnel wedges for ~20 min
# at a time (observed), so short fresh-process attempts beat one long wait.
# Alternates fused(b=256) and block(b=512) until each has produced a number,
# up to 8 rounds. Writes per-attempt logs under experiments/logs/r3queue/.
cd /root/repo || exit 1
LOGD=experiments/logs/r3queue
have_value() { tail -1 "$1" 2>/dev/null | python -c "
import json,sys
try: print(1 if json.loads(sys.stdin.read()).get('value') else 0)
except Exception: print(0)"; }

F_DONE=0; B_DONE=0
for i in 0 1 2 3 4 5 6 7; do
  if [ "$F_DONE" = 0 ]; then
    L=$LOGD/bench_fused_b256_r$i.log
    PYTHONUNBUFFERED=1 CHESS_VISION_INT8_LAYOUT=fused CVT_BENCH_BUDGET=600 \
      timeout 650 python bench.py --batch 256 > "$L" 2>&1
    [ "$(have_value "$L")" = 1 ] && F_DONE=1
  fi
  if [ "$B_DONE" = 0 ]; then
    L=$LOGD/bench_block_b512_r$i.log
    PYTHONUNBUFFERED=1 CVT_BENCH_BUDGET=600 \
      timeout 650 python bench.py > "$L" 2>&1
    [ "$(have_value "$L")" = 1 ] && B_DONE=1
  fi
  if [ "$F_DONE" = 1 ] && [ "$B_DONE" = 1 ]; then
    echo "both done after round $i"; break
  fi
  sleep 30
done
echo "retry loop finished: fused=$F_DONE block=$B_DONE"
