#!/bin/bash
# Fire a bench run when the host goes quiet (steal probe <= threshold).
# Usage: quiet_bench_watcher.sh [--scaling] [out_path]
# Probes every 120 s; fires at most once, writes JSON to out_path.
set -u
MODE=""
OUT="/tmp/quiet_bench.json"
for a in "$@"; do
  if [ "$a" = "--scaling" ]; then MODE="--scaling"; else OUT="$a"; fi
done
THRESH="${QUIET_THRESH:-1.6}"
DEADLINE=$(( $(date +%s) + ${QUIET_MAX_WAIT:-14400} ))
cd /root/repo
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  P=$(python tools/steal_probe.py 2>/dev/null | awk '{print $1}' | tr -d 's')
  OK=$(python -c "print(1 if float('$P' or 99) <= float('$THRESH') else 0)")
  if [ "$OK" = "1" ]; then
    # confirm with a second probe to avoid firing on a lucky instant
    P2=$(python tools/steal_probe.py 2>/dev/null | awk '{print $1}' | tr -d 's')
    OK2=$(python -c "print(1 if float('$P2' or 99) <= float('$THRESH') else 0)")
    if [ "$OK2" = "1" ]; then
      echo "probe $P / $P2 quiet at $(date -u +%H:%M:%S) — firing" >> "$OUT.log"
      python bench.py $MODE > "$OUT" 2>> "$OUT.log"
      echo "done at $(date -u +%H:%M:%S)" >> "$OUT.log"
      exit 0
    fi
  fi
  sleep 120
done
echo "no quiet window before deadline" >> "$OUT.log"
exit 1
