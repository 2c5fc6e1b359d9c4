#!/bin/bash
# Run a bench/TPU command with retry around axon fresh-compile stalls.
# A stalled process sleeps at ~0 CPU forever; the only fix is kill+rerun
# (see CLAUDE.md / BENCH_DETAILS.md "axon runtime limits").
#
# Usage: tools/bench_retry.sh <per-attempt-timeout-s> <attempts> cmd...
set -u
T="$1"; shift
N="$1"; shift
for i in $(seq 1 "$N"); do
  echo "[bench_retry] attempt $i/$N: $*" >&2
  timeout "$T" "$@" && exit 0
  rc=$?
  echo "[bench_retry] attempt $i failed rc=$rc" >&2
done
exit 1
