#!/bin/bash
# Quiet-window scaling-evidence runner for the bursty sandbox host:
# waits for a sustained-quiet 1-min loadavg, then runs the two-parallelism
# scaling legs and the decomposition probe, stamping loadavg before/after
# each so a burst-contaminated run is visible and re-runnable.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/scaling_evidence.log}
THRESH=${QUIET_THRESH:-1.5}

quiet_wait() {
  local ok=0
  while [ $ok -lt 2 ]; do
    L=$(cut -d' ' -f1 /proc/loadavg)
    if python3 -c "exit(0 if float('$L') < $THRESH else 1)"; then
      ok=$((ok+1))
    else
      ok=0
    fi
    sleep 25
  done
}

stamp() { echo "[$(date +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg)] $*" >> "$LOG"; }

: > "$LOG"
stamp "waiting for quiet window (thresh $THRESH)"
quiet_wait
stamp "quiet - running scaling.py"
PYTHONPATH=$PWD python3 scripts/scaling.py /root/testdata/sf0.1 >> "$LOG" 2>&1
stamp "scaling.py done"
quiet_wait
stamp "quiet - running membw_probe.py"
PYTHONPATH=$PWD python3 scripts/membw_probe.py >> "$LOG" 2>&1
stamp "membw_probe.py done"
