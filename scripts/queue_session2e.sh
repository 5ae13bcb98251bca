#!/bin/bash
cd /root/repo
while [ ! -f queue_session2d.status ]; do sleep 30; done
bash scripts/tpu_run.sh batch_scaling.log 300 python scripts/batch_scaling.py
echo "queue2e done" >> queue_session2e.status
