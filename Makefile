# Convenience entry points. The parity targets are the round-5 runbook
# (docs/parity_runbook.md): real-pretrained-weights WER parity vs the
# PyTorch reference protocol is the one SURVEY item this environment
# cannot execute (no weights, no network), so the harness stays one
# command away and rehearsable end-to-end on generated checkpoints.

PY ?= python
SPLIT ?= test
OUT ?= outputs/parity

.PHONY: test test-fast test-sharded parity-real parity-demo bench bench-smoke

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -m "not slow"

# Full suite as 3 sequential processes — each stays under the ~20 min
# process cap some environments impose on a single pytest run (sharding
# is per test file, crc32 % 3; see tests/conftest.py).
test-sharded:
	AVSR_TEST_SHARD=0/3 $(PY) -m pytest tests/ -q
	AVSR_TEST_SHARD=1/3 $(PY) -m pytest tests/ -q
	AVSR_TEST_SHARD=2/3 $(PY) -m pytest tests/ -q

# Full manual bench: every section (the estimates sum to ~18 min; the
# default in-script budget targets the driver's ~5 min window instead).
bench:
	AVSR_BENCH_BUDGET_S=2000 $(PY) bench.py

bench-smoke:
	$(PY) bench.py --smoke

# Real-checkpoint parity + the full reference eval protocol in one
# command. Usage (any HF-format local checkpoint dirs):
#   make parity-real WHISPER=/ckpts/whisper-medium LLM=/ckpts/Llama-3.2-1B \
#        [CLIP=/ckpts/clip-vit-base-patch32] \
#        [MANIFEST=/data/lrs3 SPLIT=test] [OUT=outputs/parity] \
#        [EXTRA="model.modality=audio decode.max_new_tokens=100"]
# Without MANIFEST it runs module-level numeric parity only; with it, the
# reference decode protocol (batched greedy over $(SPLIT).tsv/.wrd ->
# corpus WER + results_/wer_ artifacts) runs too. Exit 0 = in tolerance.
parity-real:
	@test -n "$(WHISPER)" -o -n "$(LLM)" || { \
	  echo "usage: make parity-real WHISPER=<dir> LLM=<dir> [CLIP=<dir>]"; \
	  echo "       [MANIFEST=<dir> SPLIT=test] [OUT=outputs/parity] [EXTRA=...]"; \
	  exit 2; }
	mkdir -p $(OUT)
	$(PY) -m avsr_tpu.cli.parity --report $(OUT)/parity_report.json \
	  $(if $(MANIFEST),--manifest $(MANIFEST) --split $(SPLIT) \
	       decode.output_dir=$(OUT),) \
	  $(if $(WHISPER),model.whisper_path=$(WHISPER),) \
	  $(if $(CLIP),model.clip_path=$(CLIP),) \
	  $(if $(LLM),model.llm_path=$(LLM),) \
	  $(EXTRA)

# Rehearsal of parity-real with FRESHLY GENERATED tiny HF checkpoints +
# a demo manifest — proves the runbook path end to end (convert ->
# dataset -> batched decode -> WER artifacts) with no external assets.
parity-demo:
	$(PY) -c "import tests.gen_demo_hf_ckpts as g; g.main('/tmp/avsr_parity_demo')"
	$(MAKE) parity-real \
	  WHISPER=/tmp/avsr_parity_demo/hf/whisper \
	  LLM=/tmp/avsr_parity_demo/hf/llm \
	  MANIFEST=/tmp/avsr_parity_demo/data \
	  OUT=/tmp/avsr_parity_demo/out \
	  EXTRA='model.modality=audio \
	    "model.whisper={d_model: 64, n_heads: 2, n_layers: 2, max_frames: 100}" \
	    "model.llm={vocab_size: 260, d_model: 64, n_layers: 2, n_heads: 4, n_kv_heads: 2, ffn_dim: 128, tie_embeddings: false, rope_theta: 10000.0, max_seq_len: 512}" \
	    "model.lora={use_lora: false}" \
	    "data.audio_buckets=[100]" data.max_audio_length=16000 \
	    data.max_label_length=24 decode.max_new_tokens=8 decode.batch_size=4'
	@echo "parity-demo OK: report at /tmp/avsr_parity_demo/out/parity_report.json"
