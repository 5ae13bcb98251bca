#!/bin/bash
# Chained after queue_session2.sh: f32 tuned-ladder re-run, then HPF training.
cd /root/repo
while [ ! -f queue_session2.status ]; do sleep 30; done
bash scripts/tpu_run.sh pretrain_ladder_f32.log 300 python scripts/run_pretrain_ladder_tuned.py
bash scripts/tpu_run.sh hpf_train.log 600 python scripts/train_hpf_clipper.py
echo "queue2b done" >> queue_session2b.status
