#!/bin/bash
# Serial TPU-chip job queue: executes lines of a jobs file in order, one at
# a time (the chip is a serial resource; see memory/protocol-run-practices).
# Lines may be appended while the queue is running; it polls for new work.
# A line "DONE" (exactly) ends the queue after all prior jobs finish.
#
# Usage: setsid nohup bash tools/chip_queue.sh /tmp/chip_jobs.txt /tmp/chip_logs &
set -u
QUEUE=$1
LOGDIR=$2
mkdir -p "$LOGDIR"
i=0
while :; do
  n=$(wc -l < "$QUEUE" 2>/dev/null || echo 0)
  if [ "$i" -ge "$n" ]; then sleep 20; continue; fi
  i=$((i + 1))
  cmd=$(sed -n "${i}p" "$QUEUE")
  [ -z "$cmd" ] && continue
  if [ "$cmd" = "DONE" ]; then echo "[queue] done" >> "$LOGDIR/queue.log"; break; fi
  echo "[queue] $(date +%H:%M:%S) job $i START: $cmd" >> "$LOGDIR/queue.log"
  bash -c "$cmd" > "$LOGDIR/job_$i.log" 2>&1
  echo "[queue] $(date +%H:%M:%S) job $i EXIT $?" >> "$LOGDIR/queue.log"
done
