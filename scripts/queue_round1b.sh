#!/bin/bash
cd /root/repo
python -m diffwdf_tpu.cli train-clipper --synthetic --data-dir synthetic_48k \
  --diode 1u1d --fs 48000 --epochs 501 --max-chunks 256 \
  --pretrained "models/pretrained/1N4148 (1U-1D)_2x16_pretrained_model.json" \
  --out "runs/clipper_1u1d/1N4148_1U1D_2x16_circuit_trained.json" \
  --log runs/clipper_1u1d/metrics.jsonl --ckpt-dir runs/clipper_1u1d/ckpt \
  --plots-dir runs/clipper_1u1d/plots > runs/clipper_1u1d/train.log 2>&1
python scripts/run_pretrain_ladder_tuned.py > pretrain_ladder_tuned.log 2>&1
echo done > /tmp/queue_round1b.done
