#!/bin/bash
# Convert LibriSpeech .flac files to 16 kHz wav in place (the reference
# ships an equivalent converter; requires ffmpeg).
# Usage: ./convert_librispeech.sh [LibriSpeech_root]
ROOT="${1:-LibriSpeech}"
find "$ROOT" -name '*.flac' | while read -r f; do
  ffmpeg -nostdin -loglevel error -y -i "$f" -ar 16000 "${f%.flac}.wav" \
    && rm "$f"
done
