#!/usr/bin/env bash
# Usage: bash scripts/rpmms.sh <command> <device> [k=v ...]
#   <command>: train | test | visualize | print_config | help
#   <device>:  tpu (default) | cpu | cpu8 (8 virtual CPU devices)
# Per-model hyperparameter preset mirrors the reference launch scripts.

COMMAND=$1
DEVICE=${2:-tpu}
shift 2 2>/dev/null || shift 1

PROJECT_DIR=$(dirname $(dirname $(realpath $0)))

case "$DEVICE" in
  cpu)  export JAX_PLATFORMS=cpu ;;
  cpu*) export JAX_PLATFORMS=cpu
        export XLA_FLAGS="--xla_force_host_platform_device_count=${DEVICE#cpu} $XLA_FLAGS" ;;
  *)    : ;;  # default platform (TPU)
esac
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}

# TPU production default: 8 fused train steps per device launch
# (tpu.fuse_steps, docs/DESIGN.md); explicit k=v overrides still win
# because later duplicates override earlier ones in the CLI grammar.
if [[ "$DEVICE" == tpu ]]; then
  FUSE="tpu.fuse_steps=8"
else
  FUSE=""
fi

ARGS=' with
  tag=rpmms split=0
  tr.total_epochs=200 tr.lr=0.0035 data.height=481 data.width=481
  '$FUSE' '$@

if [[ "$COMMAND" == "help" ]]; then
  ARGS=""
fi

exec env PYTHONPATH="$PROJECT_DIR${PYTHONPATH:+:$PYTHONPATH}" python "$PROJECT_DIR/entry/rpmms.py" $COMMAND $ARGS
