#!/usr/bin/env bash
# Submit the near-dup pipeline to a running Ray cluster as a Ray job —
# the north-rule launch shape ("run via ray job submit on a fixed-size
# multi-node Ray cluster").
#
# The job driver is the ordinary CLI (`python -m kmcp_ray dedup`): the
# job runtime exports RAY_ADDRESS inside the container, the CLI's
# --ray-address default picks it up and ATTACHES to the cluster instead
# of starting a local session (kmcp_ray/__main__.py:_init).  Resumption
# is free: re-submitting with the same --workdir skips every stage whose
# checkpoint (01_signatures / 02_edges / 03_clusters + per-partition
# lineage manifest) already exists.
#
# Usage:
#   RAY_DASHBOARD=http://head:8265 ./jobs/submit_dedup.sh \
#       /data/corpus.lance /data/out /data/workdir '{"num_partitions":256}'
#
# Single-node smoke (no cluster, same driver code path):
#   python -m kmcp_ray dedup --input IN --output OUT --workdir WD
set -euo pipefail

INPUT=${1:?input parquet/lance path}
OUTPUT=${2:?output dir}
WORKDIR=${3:?checkpoint workdir}
CONFIG=${4:-'{}'}

exec ray job submit \
    --address "${RAY_DASHBOARD:-http://127.0.0.1:8265}" \
    --working-dir "$(dirname "$(dirname "$(readlink -f "$0")")")" \
    -- python -m kmcp_ray dedup \
        --input "$INPUT" --output "$OUTPUT" --workdir "$WORKDIR" \
        --config "$CONFIG"
