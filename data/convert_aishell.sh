#!/bin/bash
# Unpack the aishell per-speaker tarballs (the reference ships an
# equivalent untar loop).
# Usage: ./convert_aishell.sh [aishell_wav_dir]
ROOT="${1:-data_aishell/wav}"
for f in "$ROOT"/*.tar.gz; do
  tar -xzf "$f" -C "$ROOT" && rm "$f"
done
