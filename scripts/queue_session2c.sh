#!/bin/bash
# After queue2b (f32 ladder + HPF train): kernel tile sweep, then fresh bench.
cd /root/repo
while [ ! -f queue_session2b.status ]; do sleep 30; done
bash scripts/tpu_run.sh kernel_sweep.log 300 python scripts/kernel_sweep.py
bash scripts/tpu_run.sh bench_refresh.log 300 python bench.py
echo "queue2c done" >> queue_session2c.status
