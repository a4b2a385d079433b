#!/usr/bin/env bash
# Train an MFA aligner on the preprocessed corpus and gather TextGrids.
# Parity surface: reference data_gen/tts/run_mfa_train_align.sh (mfa train,
# Kaldi mono->tri->lda->sat recipe) — MFA remains an external binary; this
# script shells out exactly like the reference.
#
# Usage: bash scripts/run_mfa_train_align.sh <processed_data_dir> [num_jobs]
set -euo pipefail

PROCESSED_DIR=${1:?usage: run_mfa_train_align.sh <processed_data_dir> [jobs]}
NUM_JOB=${2:-4}

command -v mfa >/dev/null 2>&1 || {
  echo "Montreal Forced Aligner (mfa) is not installed; install it to align." >&2
  exit 1
}

MFA_INPUTS="$PROCESSED_DIR/mfa_inputs"
MFA_DICT="$PROCESSED_DIR/mfa_dict.txt"
MFA_OUT_TMP="$PROCESSED_DIR/mfa_tmp"
MFA_OUT="$PROCESSED_DIR/mfa_outputs"
MODEL_FN="$PROCESSED_DIR/mfa_model.zip"

rm -rf "$MFA_OUT_TMP" "$MFA_OUT"
mkdir -p "$MFA_OUT"

CFG="$(dirname "$0")/mfa_train_config.yaml"
mfa train "$MFA_INPUTS" "$MFA_DICT" "$MODEL_FN" "$MFA_OUT_TMP" \
  -t "$PROCESSED_DIR/mfa_temp" -j "$NUM_JOB" --clean --config_path "$CFG"

# flatten group dirs: mfa_tmp/<group>/<item>.TextGrid -> mfa_outputs/<item>.TextGrid
find "$MFA_OUT_TMP" -name '*.TextGrid' -exec mv {} "$MFA_OUT/" \;
# keep the unaligned-items report next to the outputs (reference parity)
[ -e "$MFA_OUT_TMP/unaligned.txt" ] && cp "$MFA_OUT_TMP/unaligned.txt" "$PROCESSED_DIR/"
rm -rf "$MFA_OUT_TMP"
echo "| TextGrids -> $MFA_OUT"
