#!/bin/bash
cd /root/repo
while [ ! -f /tmp/queue_round1.done ]; do sleep 20; done
python scripts/run_pretrain_ladder_tuned.py > pretrain_ladder_tuned.log 2>&1
echo done > /tmp/queue_stage2.done
