#!/bin/bash
# Session-2 TPU queue: ladder retry (f32 precision) then missing zoo models.
cd /root/repo
bash scripts/tpu_run.sh ladder_retry2.log 300 python scripts/ladder_retry.py
bash scripts/tpu_run.sh missing_zoo.log 300 python scripts/pretrain_missing_zoo.py
echo "queue done" >> queue_session2.status
