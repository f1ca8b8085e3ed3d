"""avsr_tpu — a TPU-native audio-visual speech recognition framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the AVSR-LLM
reference (rishabhjain16/audio-visual-llm): frozen Whisper audio encoder +
frozen CLIP vision encoder -> trainable modality connectors -> LoRA-adapted
causal LLM, with audio / video / both modality modes, training, greedy /
sampled / beam decoding, and WER evaluation on LRS3-style manifests.

Layering (bottom-up):
    core/    typed config, logging/metrics, PRNG, registry
    mesh/    device mesh (ICI/DCN), sharding rules, collective helpers
    ops/     Pallas kernels + XLA fallbacks: log-mel STFT, flash attention,
             image preprocessing, quantization
    data/    manifest parsing, synthetic data, batching/bucketing, host pipeline
    models/  whisper encoder, CLIP ViT, connectors (all 8), llama + LoRA, AVSR
    train/   jitted train/eval steps, optimizer, checkpointing, training loop
    infer/   KV-cache generate (greedy/sample/beam), WER
    cli/     train / decode / validate / analyze_memory entry points
"""

__version__ = "0.1.0"
