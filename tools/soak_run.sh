#!/usr/bin/env bash
# Production-length soak on the real chip (VERDICT r4 next #5):
# a full preset-epoch-count SYNTH run through the launch-script
# defaults (fused launches, device prefetch, observers on), with a
# mid-run SIGTERM + resume drill — the durability evidence beyond
# 3-epoch smokes. The reference trains 90-200 epochs
# (reference scripts/pemp_stage1.sh); this runs the flagship preset's
# 90 epochs end-to-end (train -> eval-online every epoch -> snapshot ->
# auto-test), scaled in episodes/epoch only.
#
# Usage: bash tools/soak_run.sh [<model_dir>] [<train_n>] [<sigterm_epoch>]
# Writes a summary to stdout; artifacts stay in <model_dir>.

set -u
ROOT=$(dirname "$(dirname "$(realpath "$0")")")
MDIR=${1:-/tmp/soak_model_dir}
TRAIN_N=${2:-1000}
SIG_EPOCH=${3:-40}
LOG=$MDIR/soak_train.log
mkdir -p "$MDIR"

export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}

COMMON="split=0 data.dataset=SYNTH data.train_n=$TRAIN_N data.test_n=100
  data.num_workers=4 g.model_dir=$MDIR g.mongodb=True"

echo "soak: phase 1 — launch 90-epoch preset run (SIGTERM at ~epoch $SIG_EPOCH)"
bash "$ROOT/scripts/pemp_stage1.sh" train tpu $COMMON \
  > "$LOG" 2>&1 &
PID=$!
echo $PID > /tmp/soak_run.pid

# wait until the recorded metrics stream reaches the target epoch, then
# deliver SIGTERM to the TRAINING PROCESS ONLY (no pattern kills)
while kill -0 "$PID" 2>/dev/null; do
  EP=$(python - "$MDIR" <<'EOF'
import json, sys
from pathlib import Path
ms = sorted(Path(sys.argv[1]).glob("pemp_stage1/*/metrics.json"))
print(len(json.load(open(ms[-1])).get("train_loss", [])) if ms else 0)
EOF
)
  if [ "${EP:-0}" -ge "$SIG_EPOCH" ]; then
    echo "soak: epoch $EP reached — delivering SIGTERM to $PID"
    kill -TERM "$PID"
    break
  fi
  sleep 20
done
wait "$PID"
RC1=$?
echo "soak: phase 1 exited rc=$RC1 (graceful stop expected: rc=0)"
tail -n 4 "$LOG"

echo "soak: phase 2 — resume to completion"
bash "$ROOT/scripts/pemp_stage1.sh" train tpu $COMMON \
  resume=True exp_id=1 \
  >> "$LOG" 2>&1
RC2=$?
echo "soak: phase 2 exited rc=$RC2"
tail -n 6 "$LOG"

python - "$MDIR" "$LOG" <<'EOF'
import json, re, sys
from pathlib import Path
mdir, log = sys.argv[1], sys.argv[2]
ms = sorted(Path(mdir).glob("pemp_stage1/*/metrics.json"))
doc = json.load(open(ms[0]))
tl = doc.get("train_loss", [])
epochs = [s for s, _ in tl]
dup = [e for e in set(epochs) if epochs.count(e) > 1]
miou = doc.get("val_mIoU", doc.get("mIoU", []))
txt = open(log).read()
summary = {
    "epochs_recorded": len(tl),
    "duplicate_epochs": dup,          # must be [] (resume replays the
    #                                   interrupted epoch ONCE)
    "first_loss": tl[0][1] if tl else None,
    "last_loss": tl[-1][1] if tl else None,
    "best_mIoU": max((v for _, v in miou), default=None),
    "watchdog_events": txt.count("WATCHDOG"),
    "wedge_retries": txt.count("retrying in a fresh process"),
    "final_test": bool(re.search(r"Loss: [\d.]+, mIoU: [\d.]+", txt)),
}
print("SOAK_SUMMARY " + json.dumps(summary))
EOF
