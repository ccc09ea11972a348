#!/bin/bash
# Round-5 serialized TPU measurement sweep (single-core box: never run
# anything else concurrently with these).
set -x
cd /root/repo
run() {  # retry on transient axon-handshake failures
  local log=$1; shift
  for i in 1 2 3; do
    "$@" > "$log" 2>&1 && ! grep -q "Unable to initialize backend" "$log" && return 0
    sleep 20
  done
  return 1
}

run /tmp/r5_decprof.log env PYTHONPATH=/root/repo timeout 900 python tools/decode_profile.py
run /tmp/r5_synthprof.log env PYTHONPATH=/root/repo timeout 900 python tools/synth_profile.py
run /tmp/r5_2k.log timeout 1800 python bench.py --size 2048x1088 --ds 0.5
run /tmp/r5_2kprof.log timeout 1800 python bench.py --size 2048x1088 --ds 0.5 --profile
run /tmp/r5_4k.log timeout 2400 python bench.py --size 4096x2176 --ds 0.25
run /tmp/r5_f720.log timeout 2400 python bench.py --model f
echo SWEEP DONE
for f in /tmp/r5_decprof.log /tmp/r5_synthprof.log /tmp/r5_2k.log /tmp/r5_2kprof.log /tmp/r5_4k.log /tmp/r5_f720.log; do
  echo "=== $f ==="; grep -v WARNING "$f" | tail -15
done
