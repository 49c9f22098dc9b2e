#!/bin/bash
# Train a shallow-fusion n-gram from manifests (reference
# scripts/generate_ngram.sh builds kenlm from a transcript dump; here the
# self-contained trainer reads the manifests + tokenizer directly and
# writes ngram.arpa + the fast npz cache under OUTPUT_DIR).
usage() {
	echo "Usage: $0 NGRAM_ORDER DATASET_DIR TOKENIZER OUTPUT_DIR MANIFEST [MANIFEST...]"
	exit 1
}
[ "$#" -ge 5 ] || usage
ORDER=$1; DATASET_DIR=$2; TOKENIZER=$3; OUTPUT_DIR=$4; shift 4

python -m caiman_asr_tpu.lm.train_ngram \
	--order "$ORDER" \
	--dataset_dir "$DATASET_DIR" \
	--tokenizer_model "$TOKENIZER" \
	--output_dir "$OUTPUT_DIR" \
	--manifests "$@"
