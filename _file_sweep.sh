#!/bin/bash
# Per-file default-profile timing sweep; logs "file seconds status".
cd /root/repo
out=_file_times.log
: > $out
for f in tests/test_*.py; do
  t0=$(date +%s)
  timeout 900 python -m pytest "$f" -q --durations=5 > "_sweep_last.log" 2>&1
  rc=$?
  t1=$(date +%s)
  tail -12 "_sweep_last.log" | grep -E "passed|failed|error|durations|s call" >> "_sweep_tails.log"
  echo "SWEEP $f $((t1-t0))s rc=$rc" | tee -a $out
done
echo "SWEEP DONE" >> $out
