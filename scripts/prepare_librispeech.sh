#!/bin/bash
# LibriSpeech end-to-end preparation (reference
# scripts/prepare_librispeech.sh): download/convert -> EOS-segment the
# train manifests -> train the tokenizer -> mel stats -> n-gram.
set -Eeuo pipefail

: ${MAX_DURATION_SECS:=16.7}
: ${SPM_SIZE:=8703}
: ${CONFIG_NAME:=base-8703sp}
: ${DATA_DIR:="/datasets/LibriSpeech"}
: ${NGRAM_ORDER:=4}
: ${TRAIN_MANIFESTS:="librispeech-train-clean-100-flac.json librispeech-train-clean-360-flac.json librispeech-train-other-500-flac.json"}
: ${EXTRA_ARGS:=""}

echo "Preparing LibriSpeech dataset"
python -m caiman_asr_tpu.data.make_datasets.librispeech \
	--data_dir "$(dirname "$DATA_DIR")" $EXTRA_ARGS

echo "Segmenting manifests (EOS)"
EOS_MANIFESTS=$(echo $TRAIN_MANIFESTS | sed 's/.json/.eos.json/g')
python -m caiman_asr_tpu.data.eos_add \
	--data_dir "$DATA_DIR" \
	--output_dir "$DATA_DIR" \
	--manifests $TRAIN_MANIFESTS \
	--out_manifests $EOS_MANIFESTS

echo "Training tokenizer (${SPM_SIZE} pieces)"
python -m caiman_asr_tpu.data.spm_train \
	--dataset_dir "$DATA_DIR" \
	--manifests $EOS_MANIFESTS \
	--vocab_size "$SPM_SIZE" \
	--output_dir "$DATA_DIR"

echo "Generating mel stats"
python -m caiman_asr_tpu.data.generate_mel_stats \
	--model_config "configs/${CONFIG_NAME}.yaml" \
	--dataset_dir "$DATA_DIR" \
	--manifests $EOS_MANIFESTS \
	--output_path "$DATA_DIR/mel_stats.npz"

echo "Training ${NGRAM_ORDER}-gram"
TOK=$(ls "$DATA_DIR"/*.model "$DATA_DIR"/*tokenizer*.json 2>/dev/null | head -1)
scripts/generate_ngram.sh "$NGRAM_ORDER" "$DATA_DIR" "$TOK" "$DATA_DIR/ngram" $EOS_MANIFESTS

echo "Done. Train with:"
echo "  scripts/train.sh --model_config configs/${CONFIG_NAME}.yaml \\"
echo "    --dataset_dir $DATA_DIR --train_manifests $EOS_MANIFESTS \\"
echo "    --mel_stats_path $DATA_DIR/mel_stats.npz --max_duration $MAX_DURATION_SECS"
