#!/bin/bash
# two-stage babysitter: kill a run that does not pass the device probe
# within 7 min (tunnel wedge); give healthy runs 25 min per attempt.
cd /root/repo
for a in $(seq 1 40); do
  : > /tmp/cnsrun_cur.out
  python scripts/cns_ecoli_run.py >> /tmp/cnsrun_cur.out 2>&1 &
  PID=$!
  for t in $(seq 1 150); do
    sleep 10
    if ! kill -0 $PID 2>/dev/null; then break; fi
    if [ $t -ge 42 ] && ! grep -q "probe. ok" /tmp/cnsrun_cur.out; then
      echo "$(date) attempt $a: probe wedge, killing $PID" >> /tmp/recover.log
      kill -9 $PID; break
    fi
  done
  kill -0 $PID 2>/dev/null && { echo "$(date) attempt $a: 25min cap, killing $PID" >> /tmp/recover.log; kill -9 $PID; }
  cat /tmp/cnsrun_cur.out >> /tmp/cnsrun7.out
  grep -q "DONE" /tmp/cnsrun_cur.out && { echo "$(date) DONE" >> /tmp/recover.log; exit 0; }
  echo "$(date) attempt $a finished without DONE" >> /tmp/recover.log
  sleep 30
done
