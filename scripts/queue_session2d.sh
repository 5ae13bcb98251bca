#!/bin/bash
# After queue2c: widen the circuit-trained zoo (OA1154 + 3U-3D) and re-bench
# with the unrolled XLA scan paths.
cd /root/repo
while [ ! -f queue_session2c.status ]; do sleep 20; done
bash scripts/tpu_run.sh oa1154_pretrain.log 300 python -m diffwdf_tpu.cli pretrain \
  --diode oa1154 --layers 2 --width 16 --epochs 4000 --lr 2e-3 \
  --schedule cosine --precision highest \
  --out "models/pretrained/OA1154 (1U-1D)_2x16_pretrained_model.json"
bash scripts/tpu_run.sh oa1154_train.log 600 python -m diffwdf_tpu.cli train-clipper \
  --diode oa1154 --synthetic --epochs 501 \
  --pretrained "models/pretrained/OA1154 (1U-1D)_2x16_pretrained_model.json" \
  --out runs/oa1154/OA1154_1U1D_2x16_circuit_trained.json \
  --log runs/oa1154/metrics.jsonl --plots-dir runs/oa1154/plots
bash scripts/tpu_run.sh m3u3d_train.log 600 python -m diffwdf_tpu.cli train-clipper \
  --diode 3u3d --synthetic --epochs 501 \
  --pretrained "models/pretrained/1N4148 (3U-3D)_2x16_pretrained_model.json" \
  --out runs/clipper_3u3d/1N4148_3U3D_2x16_circuit_trained.json \
  --log runs/clipper_3u3d/metrics.jsonl --plots-dir runs/clipper_3u3d/plots
bash scripts/tpu_run.sh bench_refresh2.log 300 python bench.py
echo "queue2d done" >> queue_session2d.status
