#!/usr/bin/env bash
# The reference's whole Swift/K cluster run (swift/roda.sh:
#   swift cfrk.swf -n=4 -k=2 -chunkSize=4096 -dataset-dir=... ) is one
# CLI invocation here: shard FASTAs in, .cfrk files out, with retries
# and a provenance log.
set -euo pipefail
DATA_DIR=${1:?usage: run_shards.sh <dataset-dir> <out-dir> [k]}
OUT_DIR=${2:?}
K=${3:-8}
python -m cfrk_tpu "$DATA_DIR"/*.fasta -k "$K" --out-dir "$OUT_DIR" \
    --max-parallel-tasks 2 --retries 1 --provenance "$OUT_DIR/provenance.jsonl" \
    --stats
