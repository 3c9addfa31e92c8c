#!/bin/bash
# End-to-end AP loop on synthetic KITTI (VERDICT r2 item 2 / r3 item 1):
#   train (train_cli, full real data pipeline + augmentation)
#   -> eval (eval_cli, official-protocol 3D AP@R40)
#   -> torch cross-check (tools/torch_crosscheck.py)
# Produces AP_${TAG}.json at the repo root.
#
# Env knobs: EPOCHS (default 12), CKPT (checkpoint dir, default
# ./ckpts_synth_${TAG}), TAG (artifact suffix, default r05),
# DATA (dataset root, default data/synth_kitti),
# CONFIG (default configs/second/car.yaml — use
#   configs/second/all_classes.yaml with a --classes all dataset for the
#   3-class loop), FRAMES (crosscheck frames, default 100),
# SKIP_TRAIN=1 to eval/crosscheck an existing CKPT's latest epoch.
set -e
cd "$(dirname "$0")/.."
DATA=${DATA:-data/synth_kitti}
TAG=${TAG:-r05}
EPOCHS=${EPOCHS:-12}
CKPT=${CKPT:-./ckpts_synth_${TAG}}
CONFIG=${CONFIG:-configs/second/car.yaml}
FRAMES=${FRAMES:-100}
MODEL=${MODEL:-second}   # second | pvrcnn | pvrcnn2 (crosscheck: second only)

# batch 4 (the reference's own car.yaml batch); the training graph is
# fully sparse by default (cfg.train_dense_from_stage=4 — the dense
# stages' conv3d backward OOMs 16GB HBM at full geometry; parameters are
# representation-independent so eval runs at the default dense cutover)
if [ "${SKIP_TRAIN:-0}" != "1" ]; then
  python -m vision3d_tpu.train_cli --config $CONFIG --model $MODEL \
    --data-root $DATA/training/ --split-dir $DATA/splitfiles/ \
    --cache-dir $DATA/cache/ --ckpt-dir $CKPT --batch-size 4 \
    --epochs $EPOCHS --workers 6 \
    --metrics-jsonl ./metrics_synth_${TAG}.jsonl
fi

LAST=$(ls -d $CKPT/epoch_* | sed 's/.*epoch_//' | sort -n | tail -1)
echo "evaluating $CKPT/epoch_$LAST"
python -m vision3d_tpu.eval_cli --config $CONFIG --model $MODEL \
  --data-root $DATA/training/ --split-dir $DATA/splitfiles/ \
  --cache-dir $DATA/cache/ --ckpt $CKPT/epoch_$LAST --split val \
  --batch-size 8 --out-json ./AP_${TAG}_ours.json

if [ "$MODEL" == "second" ]; then
# non-fatal: a crosscheck failure must not discard the trained AP artifact
python tools/torch_crosscheck.py --ckpt $CKPT/epoch_$LAST \
  --config $CONFIG --data-root $DATA/training/ \
  --split-dir $DATA/splitfiles/ --cache-dir $DATA/cache/ \
  --frames $FRAMES --out-json ./AP_${TAG}_crosscheck.json || \
  echo "{\"error\": \"crosscheck failed, see loop log\"}" \
    > ./AP_${TAG}_crosscheck.json
else
  echo '{"note": "torch crosscheck covers the SECOND restatement only"}' \
    > ./AP_${TAG}_crosscheck.json
fi

TAG=$TAG CKPT=$CKPT LAST=$LAST DATA=$DATA CONFIG=$CONFIG python - <<'EOF2'
import json, os
tag = os.environ["TAG"]
ours = json.load(open(f"AP_{tag}_ours.json"))
cross = json.load(open(f"AP_{tag}_crosscheck.json"))
json.dump(
    dict(
        dataset=f"synthetic KITTI (tools/make_synthetic_kitti.py) at {os.environ['DATA']}",
        config=os.environ["CONFIG"],
        checkpoint=f"{os.environ['CKPT']}/epoch_{os.environ['LAST']}",
        ap_val_full=ours,
        crosscheck=cross,
    ),
    open(f"AP_{tag}.json", "w"), indent=2,
)
print(json.dumps(json.load(open(f"AP_{tag}.json")), indent=2))
EOF2
