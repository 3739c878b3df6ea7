#!/usr/bin/env bash
# PubLayNet dataset ingestion: download -> extract -> upload to GCS.
# Equivalent of the reference's scripts/data_gen.sh:4-58 (IBM DAX CDN
# tarball -> gs://layoutdit/data/publaynet/), parameterized instead of
# hard-coded and resumable.
#
# Usage: scripts/data_gen.sh [GCS_DEST] [WORK_DIR]
set -euo pipefail

GCS_DEST="${1:-gs://layoutdit/data/publaynet}"
WORK_DIR="${2:-/tmp/publaynet}"
TARBALL_URL="https://dax-cdn.cdn.appdomain.cloud/dax-publaynet/1.0.0/publaynet.tar.gz"

mkdir -p "$WORK_DIR"
cd "$WORK_DIR"

if [ ! -f publaynet.tar.gz ]; then
  echo ">> downloading PubLayNet (~96GB)"
  wget -c "$TARBALL_URL"
fi

if [ ! -d publaynet ]; then
  echo ">> extracting"
  tar -xzf publaynet.tar.gz
fi

echo ">> uploading to $GCS_DEST"
# train/val/test splits + annotation JSONs, parallel composite uploads
gsutil -m rsync -r publaynet/train "$GCS_DEST/train"
gsutil -m rsync -r publaynet/val "$GCS_DEST/val"
gsutil -m rsync -r publaynet/test "$GCS_DEST/test" || true
gsutil cp publaynet/train.json "$GCS_DEST/train.json"
gsutil cp publaynet/val.json "$GCS_DEST/val.json"

echo ">> done. Point train_config.train_base_path at ${GCS_DEST%/publaynet}"
