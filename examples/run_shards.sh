#!/usr/bin/env bash
# The reference's whole Swift/K cluster run (swift/roda.sh:
#   swift cfrk.swf -n=4 -k=2 -chunkSize=4096 -dataset-dir=... ) is one
# CLI invocation here: shard FASTAs in, .cfrk files out, with retries
# and a provenance log.
set -euo pipefail
DATA_DIR=${1:?usage: run_shards.sh <dataset-dir> <out-dir> [k]}
OUT_DIR=${2:?}
K=${3:-8}
shopt -s nullglob
inputs=("$DATA_DIR"/*.fasta "$DATA_DIR"/*.fasta.gz "$DATA_DIR"/*.fa \
        "$DATA_DIR"/*.fa.gz "$DATA_DIR"/*.fastq "$DATA_DIR"/*.fastq.gz)
[ ${#inputs[@]} -gt 0 ] || { echo "no FASTA/FASTQ shards in $DATA_DIR" >&2; exit 1; }
python -m cfrk_tpu "${inputs[@]}" -k "$K" --out-dir "$OUT_DIR" \
    --max-parallel-tasks 2 --retries 1 --provenance "$OUT_DIR/provenance.jsonl" \
    --stats
