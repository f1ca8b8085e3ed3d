"""Canonical typed configuration for avsr_tpu.

One schema consumed by every entry point (train / decode / validate), loaded
from YAML with CLI dotted-path overrides and validated at load time.  This
replaces the reference's three overlapping config systems (flat argparse+YAML
merge in scripts/clip_whisper/train.py:133-139, typed dataclasses in
src/utils/config.py:14-164, and shell-wrapper defaults) with a single source
of truth — see SURVEY.md §5.6.

Sections mirror the reference YAML (configs/clip_whisper.yaml:4-55): ``data``,
``model``, ``training``, ``processor`` — plus TPU-native ``mesh`` and
``runtime`` sections the reference has no equivalent of.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field, fields, is_dataclass
from pathlib import Path
from typing import Any

import yaml

# ---------------------------------------------------------------------------
# Schema
# ---------------------------------------------------------------------------

MODALITIES = ("audio", "video", "both")
CONNECTOR_TYPES = (
    # single-input projectors (reference modality_connector.py:25-299)
    "simple", "deep", "conv", "attention", "adaptive",
    # dual-input fusion connectors (reference advanced_connectors.py:7-621 —
    # implemented there but never wired; first-class here, SURVEY.md §2.1)
    "cross_modal", "qformer", "perceiver",
    # the reference's "multimodal_adapter" fusion type
    # (src/utils/config.py:56, :68-70 — declared, never implemented)
    "adapter",
    # sparse mixture-of-experts projector (TPU-native extension: GShard-style
    # capacity-based top-k routing, dense one-hot dispatch so every op is an
    # MXU einsum; experts shard over the mesh "ep" axis)
    "moe",
)


@dataclass(frozen=True)
class DataConfig:
    """Dataset paths and shape caps (reference configs/clip_whisper.yaml:4-14)."""

    path: str = ""
    train_manifest: str = "train.tsv"
    train_labels: str = "train.wrd"
    val_manifest: str = "valid.tsv"
    val_labels: str = "valid.wrd"
    test_manifest: str = "test.tsv"
    test_labels: str = "test.wrd"
    batch_size: int = 8
    max_audio_length: int = 480_000     # 30 s @ 16 kHz
    max_video_length: int = 100         # max video frames
    max_label_length: int = 128         # max label tokens
    num_workers: int = 2
    synthetic: bool = False             # use the synthetic dataset (no media needed)
    synthetic_size: int = 100
    # Length bucketing for static-shape batches (TPU-native; no ref equivalent).
    audio_buckets: tuple[int, ...] = (500, 1000, 1500)   # mel frames (pre-conv)
    video_buckets: tuple[int, ...] = (25, 50, 100)       # video frames
    # Compact host->device link format (no ref equivalent): audio ships as
    # int16 PCM (bit-exact round trip for WAV-PCM16 sources) and video as
    # planar YUV420 (1.5 B/px — the chroma subsampling consumer codecs
    # already store), both reconstructed on device inside featurize. ~2.3x
    # fewer bytes over PCIe/the tunnel per AV batch.
    compact_transfer: bool = False
    # SpecAugment (train-time only, on-device; ops/specaugment.py — the
    # reference has no augmentation of any kind)
    specaugment: bool = False
    spec_time_masks: int = 2
    spec_time_width: int = 50           # mel frames (~0.5 s)
    spec_freq_masks: int = 2
    spec_freq_width: int = 12           # of the 80 mel bins
    # Video augmentation (train-time only, on-device; ops/videoaug.py —
    # the standard VSR recipe: per-utterance random crop-shift +
    # horizontal flip + normalized-scale brightness/contrast jitter,
    # identical across an utterance's frames)
    video_augment: bool = False
    vid_max_shift: int = 8              # pixels (crop of a padded frame)
    vid_flip: bool = True
    vid_brightness: float = 0.1         # on the normalized pixel scale
    vid_contrast: float = 0.1


@dataclass(frozen=True)
class WhisperConfig:
    """Whisper audio-encoder architecture (HF openai/whisper-* geometry)."""

    n_mels: int = 80
    d_model: int = 1024          # whisper-medium
    n_heads: int = 16
    n_layers: int = 24
    ffn_mult: int = 4
    max_frames: int = 3000       # 30 s of 10 ms hops
    # The 16 kHz / n_fft=400 / hop=160 log-mel protocol is fixed by the
    # pretrained Whisper weights and lives as constants in ops.logmel —
    # config knobs for it would be dead (nothing could honor a change).

    @property
    def max_source_positions(self) -> int:
        return self.max_frames // 2  # conv2 stride-2


@dataclass(frozen=True)
class SpeechSSLConfig:
    """HuBERT / Wav2Vec2 audio-encoder geometry (HF facebook/hubert-*,
    facebook/wav2vec2-*). The reference declares these encoder choices in
    its config (src/utils/config.py:53-56) but never implements them;
    here they are selectable via ``model.audio_encoder``."""

    d_model: int = 768           # *-base; 1024 for *-large
    n_heads: int = 12
    n_layers: int = 12
    ffn_mult: int = 4
    conv_dims: tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernels: tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_strides: tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False                  # True for *-large
    feat_extract_norm: str = "group"         # group (base) | layer (large)
    do_stable_layer_norm: bool = False       # pre-LN blocks (large)
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    sample_rate: int = 16000
    normalize_input: bool = True             # per-utterance zero-mean/unit-var

    @property
    def downsample(self) -> int:
        out = 1
        for s in self.conv_strides:
            out *= s
        return out


@dataclass(frozen=True)
class ClipConfig:
    """CLIP ViT vision-encoder architecture (HF openai/clip-vit-* geometry)."""

    image_size: int = 224
    patch_size: int = 32
    d_model: int = 768           # clip-vit-base-patch32
    n_heads: int = 12
    n_layers: int = 12
    ffn_mult: int = 4


@dataclass(frozen=True)
class ResNetConfig:
    """ResNet vision-encoder geometry (HF microsoft/resnet-*). The reference
    declares ``video_encoder: resnet`` (src/utils/config.py:53-56) without
    implementing it; selectable here via ``model.video_encoder``."""

    image_size: int = 224
    embedding_size: int = 64
    hidden_sizes: tuple[int, ...] = (256, 512, 1024, 2048)   # resnet-50
    depths: tuple[int, ...] = (3, 4, 6, 3)
    layer_type: str = "bottleneck"       # bottleneck (50+) | basic (18/34)
    reduction: int = 4                   # bottleneck channel reduction
    downsample_in_first_stage: bool = False


@dataclass(frozen=True)
class EfficientNetConfig:
    """EfficientNet vision-encoder geometry (HF google/efficientnet-b*). The
    reference declares ``video_encoder: efficientnet``
    (src/utils/config.py:53-56) without implementing it; selectable here via
    ``model.video_encoder``. Defaults are the b0 block table; b1-b7 scale via
    width/depth coefficients."""

    image_size: int = 224
    width_coefficient: float = 1.0
    depth_coefficient: float = 1.0
    depth_divisor: int = 8
    in_channels: tuple[int, ...] = (32, 16, 24, 40, 80, 112, 192)
    out_channels: tuple[int, ...] = (16, 24, 40, 80, 112, 192, 320)
    kernel_sizes: tuple[int, ...] = (3, 3, 5, 3, 5, 5, 3)
    strides: tuple[int, ...] = (1, 2, 2, 2, 1, 2, 1)
    num_block_repeats: tuple[int, ...] = (1, 2, 2, 3, 3, 4, 1)
    expand_ratios: tuple[int, ...] = (1, 6, 6, 6, 6, 6, 6)
    depthwise_padding: tuple[int, ...] = ()   # block idxs w/ symmetric pad
    squeeze_expansion_ratio: float = 0.25
    hidden_dim: int = 1280                    # top width (b0/b1 1280, b2 1408…)


@dataclass(frozen=True)
class AVHubertConfig:
    """AV-HuBERT video-branch geometry (Shi et al.). The reference declares
    ``video_encoder: avhubert`` + ``avhubert_layer`` /
    ``finetune_avhubert_layers`` (src/utils/config.py:55, 72-74) without
    implementing them; selectable here via ``model.video_encoder``."""

    image_size: int = 88                 # grayscale lip-ROI crops
    frontend_channels: int = 64          # 3D-conv stem width
    trunk_widths: tuple[int, ...] = (64, 128, 256, 512)   # resnet-18
    trunk_depths: tuple[int, ...] = (2, 2, 2, 2)
    d_model: int = 768                   # base; 1024 for large
    n_heads: int = 12
    n_layers: int = 12
    ffn_mult: int = 4
    do_stable_layer_norm: bool = False
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    # Which transformer layer's output to tap (ref avhubert_layer :72):
    # -1 = last, 0 = front-end only, k>0 = after the first k layers.
    avhubert_layer: int = -1


@dataclass(frozen=True)
class LLMConfig:
    """Causal-LM decoder architecture (Llama-class geometry)."""

    vocab_size: int = 128_256    # llama-3.2
    d_model: int = 2048          # llama-3.2-1B
    n_layers: int = 16
    n_heads: int = 32
    n_kv_heads: int = 8
    ffn_dim: int = 8192
    rope_theta: float = 500_000.0
    rms_eps: float = 1e-5
    tie_embeddings: bool = True
    max_seq_len: int = 2048
    # Sparse MoE FFN layers (TPU-native scaling extension; 0 = dense
    # Llama). Every ``moe_every``-th block replaces its SwiGLU MLP with
    # ``moe_experts`` SwiGLU experts behind a capacity-routed top-k
    # router (ops.moe); expert weights shard over mesh.ep. Parameter
    # count scales ~E x in the MoE layers at ~topk x the FLOPs/token.
    moe_experts: int = 0
    moe_topk: int = 2
    moe_every: int = 1           # 1 = every layer; 2 = every 2nd, ...
    moe_capacity_factor: float = 1.25


@dataclass(frozen=True)
class LoRAConfig:
    """LoRA adapter hyperparameters (reference clip_whisper_model.py:973-1000)."""

    use_lora: bool = True
    r: int = 16
    alpha: int = 32
    dropout: float = 0.05
    # Which LLM projections receive adapters.
    target_modules: tuple[str, ...] = ("q_proj", "k_proj", "v_proj", "o_proj")
    init_scale: float = 1.0      # ref scales B-init by 0.01; we default to standard 0-init B


@dataclass(frozen=True)
class ModelConfig:
    """Top-level model composition (reference configs/clip_whisper.yaml:17-30)."""

    llm_path: str = ""                    # HF dir for weight conversion (optional)
    whisper_path: str = ""
    clip_path: str = ""
    audio_encoder_path: str = ""          # HF dir for hubert/wav2vec2 conversion
    video_encoder_path: str = ""          # HF dir for resnet conversion
    modality: str = "both"                # audio | video | both
    # Encoder family selection (reference src/utils/config.py:53-56 declares
    # these choices but implements only whisper+clip — SURVEY.md §2.5).
    audio_encoder: str = "whisper"        # whisper | hubert | wav2vec2
    video_encoder: str = "clip"           # clip | resnet | efficientnet | avhubert
    connector_type: str = "simple"        # one of CONNECTOR_TYPES
    fusion_scale: float = 0.5             # audio weight in weighted-sum fusion
    fusion_mode: str = "weighted_sum"     # weighted_sum | concat_seq | connector
    max_seq_len: int = 512                # cap on fused encoder sequence
    freeze_encoders: bool = True
    freeze_llm: bool = True               # train connectors (+LoRA) only by default
    # (the reference's use_fp16 flag maps to runtime.compute_dtype here)
    use_4bit: bool = False                # weight-only int4 LLM quantization
    use_8bit: bool = False                # weight-only int8 LLM quantization
    prompt: str = "Transcribe the speech into text:"
    whisper: WhisperConfig = field(default_factory=WhisperConfig)
    ssl: SpeechSSLConfig = field(default_factory=SpeechSSLConfig)
    clip: ClipConfig = field(default_factory=ClipConfig)
    resnet: ResNetConfig = field(default_factory=ResNetConfig)
    efficientnet: EfficientNetConfig = field(default_factory=EfficientNetConfig)
    avhubert: AVHubertConfig = field(default_factory=AVHubertConfig)
    llm: LLMConfig = field(default_factory=LLMConfig)
    lora: LoRAConfig = field(default_factory=LoRAConfig)
    # Train encoder layer-norm scales/biases even when the encoders are
    # frozen (ref unfreeze_layer_norms, src/utils/config.py:86).
    unfreeze_layer_norms: bool = False
    # Unfreeze specific AV-HuBERT transformer layers while the rest of the
    # encoder stays frozen (ref finetune_avhubert_layers :73-74).
    finetune_avhubert_layers: tuple[int, ...] = ()
    # Connector internals
    connector_hidden_mult: int = 2
    qformer_queries: int = 32             # ref advanced_connectors.py:232
    perceiver_latents: int = 64           # ref advanced_connectors.py:433
    adapter_dim: int = 256                # ref src/utils/config.py:68
    num_adapter_layers: int = 2           # ref src/utils/config.py:70
    # MoE connector (connector_type="moe"): GShard-style top-k routing with
    # a static per-expert capacity; experts shard over mesh.ep.
    moe_experts: int = 8
    moe_topk: int = 2
    moe_capacity_factor: float = 1.25     # capacity = ceil(topk*N/E * factor)
    moe_aux_weight: float = 0.01          # load-balance loss weight
    moe_z_weight: float = 1e-3            # router z-loss weight

    @property
    def audio_dim(self) -> int:
        """Feature dim the audio connector consumes."""
        if self.audio_encoder == "whisper":
            return self.whisper.d_model
        return self.ssl.d_model

    @property
    def video_dim(self) -> int:
        """Feature dim the video connector consumes."""
        if self.video_encoder == "clip":
            return self.clip.d_model
        if self.video_encoder == "resnet":
            return self.resnet.hidden_sizes[-1]
        if self.video_encoder == "efficientnet":
            return self.efficientnet.hidden_dim
        return (self.avhubert.trunk_widths[-1]
                if self.avhubert.avhubert_layer == 0
                else self.avhubert.d_model)

    @property
    def image_size(self) -> int:
        if self.video_encoder == "clip":
            return self.clip.image_size
        if self.video_encoder == "resnet":
            return self.resnet.image_size
        if self.video_encoder == "efficientnet":
            return self.efficientnet.image_size
        return self.avhubert.image_size


@dataclass(frozen=True)
class TrainingConfig:
    """Optimization schedule (reference configs/clip_whisper.yaml:33-43)."""

    num_epochs: int = 10
    max_steps: int = -1                   # >0 overrides epochs
    # Startup doubling probe for the largest batch that fits HBM
    # (ref _find_optimal_batch_size, trainer:976-1003); overrides
    # data.batch_size when it finds a larger working size.
    auto_batch_size: bool = False
    learning_rate: float = 2e-5
    weight_decay: float = 0.01
    # adamw (ref trainer:202-207) | adafactor (factored second moments,
    # O(rows+cols) state per matrix — the classic TPU large-model
    # optimizer) | lion (sign-momentum, one moment buffer)
    optimizer: str = "adamw"
    adam_b1: float = 0.9
    adam_b2: float = 0.95                 # ref trainer:202-207
    grad_accum_steps: int = 1             # real accumulation (ref declared, never used)
    max_grad_norm: float = 0.5
    warmup_steps: int = 100
    schedule: str = "cosine"              # cosine | linear | constant
    log_interval: int = 10
    save_every_steps: int = 1000
    save_every_secs: float = 7200.0       # ref 2-hour cadence trainer:256-257
    keep_checkpoints: int = 3
    checkpoint_dir: str = "outputs/avsr"
    resume_from: str = ""
    seed: int = 42
    # Stability guards (ref trainer:338-351, 444-451)
    max_unstable_batches: int = 5
    loss_stability_window: int = 5
    # In-training WER eval: every N epochs, greedily decode up to
    # eval_wer_max_utts validation utterances and track corpus WER — the
    # metric of record (SURVEY.md §5.5). The reference validates on loss
    # only (trainer:543-602); loss and WER can diverge (e.g. a model that
    # sharpens onto wrong tokens), so the framework tracks both. 0 = off.
    eval_wer_every_epochs: int = 0
    eval_wer_max_utts: int = 32
    # Which validation metric defines the "best" checkpoint and drives
    # early stopping: "loss" (ref behavior, trainer:301-305) | "wer"
    # (requires eval_wer_every_epochs > 0).
    best_metric: str = "loss"
    # Stop after N consecutive evaluations of best_metric without
    # improvement (no reference equivalent). 0 = off.
    early_stop_patience: int = 0


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh + sharding — TPU-native, no reference equivalent (SURVEY.md §2.4)."""

    dp: int = -1                 # -1: infer (fill remaining devices)
    fsdp: int = 1                # parameter sharding axis (zero-style)
    tp: int = 1                  # tensor parallel over ICI
    sp: int = 1                  # sequence/context parallel (ring attention)
    # Expert parallelism: the MoE connector's stacked expert weights shard
    # over this axis; for every non-MoE op it behaves as an extra data axis
    # (the batch shards over it), so the dispatch einsum becomes the GShard
    # all-to-all under SPMD propagation.
    ep: int = 1
    # GPipe pipeline parallelism over the LLM layer stack (ops.pipeline);
    # training-path only, mutually exclusive with sp for now.
    pp: int = 1
    # Multi-slice data parallel over DCN (slice-to-slice network): only the
    # dp gradient all-reduce crosses DCN; fsdp/sp/tp/pp traffic stays on ICI.
    dcn_dp: int = 1
    axis_names: tuple[str, ...] = ("dcn", "dp", "fsdp", "ep", "sp", "tp", "pp")
    remat: bool = True           # jax.checkpoint on transformer blocks
    donate: bool = True


@dataclass(frozen=True)
class RuntimeConfig:
    """Runtime toggles."""

    param_dtype: str = "float32"        # master params
    compute_dtype: str = "bfloat16"
    debug_nans: bool = False
    profile_dir: str = ""               # jax.profiler trace output dir
    use_pallas: str = "auto"            # auto | always | never
    # PRNG implementation for jax.random keys. "rbg" uses the TPU's
    # hardware RNG path — measured 17 ms/step cheaper than threefry for
    # LoRA dropout masks at the flagship shapes; "threefry" is the JAX
    # default (strongest reproducibility guarantees across versions).
    prng_impl: str = "rbg"
    # Persistent XLA compilation cache ("" disables) — kills the ~2 min
    # flagship recompile across processes.
    compilation_cache_dir: str = "~/.cache/avsr_tpu_xla"


@dataclass(frozen=True)
class DecodeConfig:
    """Generation / eval protocol (reference decode.py:41-66)."""

    max_new_tokens: int = 100
    temperature: float = 0.0            # 0 => greedy
    top_p: float = 0.9
    num_beams: int = 1                  # >1 => beam search
    length_penalty: float = 1.0
    batch_size: int = 8
    output_dir: str = "outputs/decode"
    # Serving-only: int8 KV cache (quantized at prefill, per-head scales;
    # models.llama.quantize_cache) — decode is cache-bandwidth bound at
    # batch >= 16; measured ~1.6x tokens/s at B=32.
    kv_cache_dtype: str = "bfloat16"    # bfloat16 | int8
    # Serving-only: quantize the hidden->vocab projection at decode time
    # (0 = off). The fp embedding still serves token gathers; the vocab
    # matmul streams int bytes through ops.qmatmul. Biggest single
    # per-token HBM read at 128k vocab (525 MB bf16 -> 131/262 MB).
    lm_head_bits: int = 0               # 0 | 4 | 8
    # Streaming-only: block size (seconds) for incremental encoding + KV
    # reuse. 0 = exact mode (re-encode the whole buffer per chunk; finalize
    # equals offline decode). > 0 = blockwise mode: completed blocks are
    # encoded once and their LLM KV frozen in a persistent cache
    # (infer.generate.prefill_extend / generate_continue), so per-chunk
    # cost stays flat across the window instead of growing with the
    # buffer. Works for all three modalities: CLIP features are per-frame
    # and log-mel blocks are time-local, so a block freezes both streams
    # over the same stream_block_s span (fusion is block-local — the
    # documented blockwise approximation; the exact mode's finalize ==
    # offline decode).
    stream_block_s: float = 0.0
    # Frame rate used to convert stream_block_s into a video-frame block
    # size (blockwise streaming with modality video|both).
    stream_video_fps: float = 25.0
    # Serving-only: continuous batching over a fixed slot pool
    # (infer.engine.ServingEngine). 0 = static batches (the reference's
    # decode.py:405-440 protocol). > 0 = number of resident decode slots:
    # finished rows are refilled from the queue mid-flight, so ragged
    # transcript lengths stop head-of-line blocking the batch. Greedy,
    # single-chip.
    engine_slots: int = 0
    # Speculative decoding (infer.speculative): a quantized self-draft
    # proposes spec_gamma tokens per full-model verify pass. temperature=0
    # is token-identical to greedy; temperature>0 runs speculative
    # SAMPLING (rejection scheme) — exactly target-distributed. Only the
    # tokens/s changes, never the text distribution.
    speculative: bool = False
    spec_gamma: int = 4
    spec_draft_bits: int = 8            # 4 | 8 (weight-only self-draft)
    # > 0: LayerSkip-style early-exit draft — the target's FIRST k
    # transformer blocks (+ its final norm/lm head), quantized to
    # spec_draft_bits. ~k/L of a draft step's bytes AND no second weight
    # copy. Acceptance depends on how predictable the model's late layers
    # are: excellent after LayerSkip-style training, near-zero on an
    # uncalibrated model — exactness never depends on it (the verify pass
    # decides every token). 0 = full-depth quantized self-draft.
    spec_draft_layers: int = 0
    # Separately-TRAINED draft (the profitable regime — docs/serving.md
    # round-5 measurement: acceptance is a draft-quality property; a
    # task-trained draft clears the B=1 break-even where every
    # random-init draft floors at ~1 tok/pass). Point these at an
    # `avsr-distill` export: the params dir and its config.yaml. The
    # draft runs its own encode/prefix (its architecture may differ —
    # only the vocabulary must match) and is quantized to
    # spec_draft_bits like every other draft. Standalone decode only
    # (engine slot caches assume the self/layer-skip draft geometry).
    spec_draft_checkpoint: str = ""
    spec_draft_config: str = ""


@dataclass(frozen=True)
class AVSRConfig:
    """Root config."""

    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    runtime: RuntimeConfig = field(default_factory=RuntimeConfig)
    decode: DecodeConfig = field(default_factory=DecodeConfig)

    def validate(self) -> "AVSRConfig":
        if self.model.modality not in MODALITIES:
            raise ValueError(
                f"modality must be one of {MODALITIES}, got {self.model.modality!r}")
        if self.training.optimizer not in ("adamw", "adafactor", "lion"):
            raise ValueError(
                "training.optimizer must be adamw | adafactor | lion, "
                f"got {self.training.optimizer!r}")
        if self.model.connector_type not in CONNECTOR_TYPES:
            raise ValueError(
                f"connector_type must be one of {CONNECTOR_TYPES}, "
                f"got {self.model.connector_type!r}")
        dual = self.model.connector_type in ("cross_modal", "qformer",
                                             "perceiver", "adapter")
        if dual and self.model.modality != "both":
            raise ValueError(
                f"connector_type={self.model.connector_type!r} fuses audio+video and "
                f"requires modality='both' (got {self.model.modality!r})")
        if self.model.connector_type == "moe":
            if self.model.moe_topk < 1 or self.model.moe_topk > self.model.moe_experts:
                raise ValueError(
                    f"moe_topk must be in [1, moe_experts={self.model.moe_experts}], "
                    f"got {self.model.moe_topk}")
            if self.model.moe_capacity_factor <= 0:
                raise ValueError("moe_capacity_factor must be > 0")
        llm = self.model.llm
        if llm.moe_experts:
            if llm.moe_topk < 1 or llm.moe_topk > llm.moe_experts:
                raise ValueError(
                    f"llm.moe_topk must be in [1, moe_experts="
                    f"{llm.moe_experts}], got {llm.moe_topk}")
            if llm.moe_every < 1 or llm.moe_every > llm.n_layers:
                raise ValueError(
                    f"llm.moe_every must be in [1, n_layers="
                    f"{llm.n_layers}] (larger would create zero MoE "
                    f"layers), got {llm.moe_every}")
            if self.mesh.pp > 1:
                raise ValueError(
                    "llm.moe_experts with mesh.pp > 1 is unsupported (the "
                    "GPipe stage scan does not thread MoE aux losses)")
        if self.mesh.ep > 1:
            conn_moe = self.model.connector_type == "moe"
            llm_moe = llm.moe_experts > 0
            if not (conn_moe or llm_moe):
                raise ValueError(
                    "mesh.ep > 1 requires MoE somewhere (connector_type="
                    "'moe' or llm.moe_experts > 0); with dense models it "
                    "would silently act as extra data parallelism)")
            if conn_moe and self.model.moe_experts % self.mesh.ep != 0:
                raise ValueError(
                    f"moe_experts={self.model.moe_experts} must divide evenly "
                    f"over mesh.ep={self.mesh.ep}")
            if llm_moe and llm.moe_experts % self.mesh.ep != 0:
                raise ValueError(
                    f"llm.moe_experts={llm.moe_experts} must divide evenly "
                    f"over mesh.ep={self.mesh.ep}")
        if self.model.use_4bit and self.model.use_8bit:
            raise ValueError("use_4bit and use_8bit are mutually exclusive")
        if self.decode.lm_head_bits not in (0, 4, 8):
            raise ValueError("decode.lm_head_bits must be 0, 4 or 8")
        if self.decode.kv_cache_dtype not in ("bfloat16", "int8"):
            raise ValueError("decode.kv_cache_dtype must be bfloat16|int8")
        if ((self.decode.spec_draft_checkpoint
             or self.decode.spec_draft_config)
                and not self.decode.speculative):
            raise ValueError(
                "decode.spec_draft_checkpoint/spec_draft_config are set "
                "but decode.speculative is false — the trained draft "
                "would be silently ignored; add decode.speculative=true")
        if self.decode.speculative:
            if self.decode.num_beams > 1:
                raise ValueError(
                    "decode.speculative requires num_beams=1 (greedy or "
                    "sampled; beam search has its own decode loop)")
            if self.model.use_4bit or self.model.use_8bit:
                raise ValueError(
                    "decode.speculative with a quantized target has no "
                    "cheaper self-draft to build (spec_draft_bits IS the "
                    "quantization); serve the bf16 target speculatively "
                    "or the quantized target directly")
            if self.decode.spec_draft_bits not in (4, 8):
                raise ValueError("decode.spec_draft_bits must be 4 or 8")
            if self.decode.spec_gamma < 1:
                raise ValueError("decode.spec_gamma must be >= 1")
            if not (0 <= self.decode.spec_draft_layers
                    < self.model.llm.n_layers):
                raise ValueError(
                    "decode.spec_draft_layers must be 0 (full-depth "
                    "self-draft) or in [1, n_layers-1] — got "
                    f"{self.decode.spec_draft_layers} with "
                    f"{self.model.llm.n_layers} layers")
            if self.decode.kv_cache_dtype != "bfloat16":
                raise ValueError(
                    "decode.speculative needs kv_cache_dtype=bfloat16 "
                    "(the verify pass extends a bf16 cache in place)")
            if self.decode.engine_slots and self.decode.temperature > 0:
                raise ValueError(
                    "speculative serving (engine_slots + speculative) is "
                    "greedy-only; set decode.temperature=0 or drop one "
                    "of the two knobs")
            if bool(self.decode.spec_draft_checkpoint) != bool(
                    self.decode.spec_draft_config):
                raise ValueError(
                    "decode.spec_draft_checkpoint and "
                    "decode.spec_draft_config come as a pair (the export "
                    "dir and the draft's config.yaml — avsr-distill "
                    "writes both)")
            if self.decode.spec_draft_checkpoint:
                if self.decode.spec_draft_layers:
                    raise ValueError(
                        "decode.spec_draft_checkpoint (separate trained "
                        "draft) and spec_draft_layers (layer-skip "
                        "self-draft) are mutually exclusive")
                if self.decode.engine_slots:
                    raise ValueError(
                        "decode.spec_draft_checkpoint is standalone-decode "
                        "only: engine slot caches assume the self/"
                        "layer-skip draft geometry")
        if self.model.audio_encoder not in ("whisper", "hubert", "wav2vec2"):
            raise ValueError(
                f"audio_encoder must be whisper|hubert|wav2vec2, "
                f"got {self.model.audio_encoder!r}")
        if self.model.video_encoder not in ("clip", "resnet", "efficientnet",
                                            "avhubert"):
            raise ValueError(
                f"video_encoder must be clip|resnet|efficientnet|avhubert, "
                f"got {self.model.video_encoder!r}")
        if self.model.avhubert.avhubert_layer > self.model.avhubert.n_layers:
            raise ValueError("avhubert_layer exceeds avhubert.n_layers")
        if self.model.resnet.layer_type not in ("bottleneck", "basic"):
            raise ValueError("resnet.layer_type must be bottleneck|basic")
        if len(self.model.resnet.hidden_sizes) != len(self.model.resnet.depths):
            raise ValueError("resnet hidden_sizes/depths lengths differ")
        if self.model.ssl.feat_extract_norm not in ("group", "layer"):
            raise ValueError("ssl.feat_extract_norm must be group|layer")
        if not (len(self.model.ssl.conv_dims) == len(self.model.ssl.conv_kernels)
                == len(self.model.ssl.conv_strides)):
            raise ValueError("ssl conv_dims/conv_kernels/conv_strides lengths differ")
        if self.training.grad_accum_steps < 1:
            raise ValueError("grad_accum_steps must be >= 1")
        if self.model.llm.n_heads % max(self.model.llm.n_kv_heads, 1) != 0:
            raise ValueError("llm.n_heads must be divisible by llm.n_kv_heads")
        for b, nxt in zip(self.data.audio_buckets, self.data.audio_buckets[1:]):
            if nxt <= b:
                raise ValueError("audio_buckets must be strictly increasing")
        if (self.model.audio_encoder == "whisper"
                and self.data.audio_buckets[-1] > self.model.whisper.max_frames):
            raise ValueError(
                f"largest audio bucket ({self.data.audio_buckets[-1]} mel "
                f"frames) exceeds whisper.max_frames "
                f"({self.model.whisper.max_frames})")
        if self.decode.stream_block_s > 0 and self.decode.stream_video_fps <= 0:
            raise ValueError(
                "decode.stream_video_fps must be > 0 (it sizes the "
                "video-frame block for blockwise streaming)")
        if self.decode.engine_slots > 0 and self.decode.num_beams > 1:
            raise ValueError(
                "decode.engine_slots (continuous batching) decodes slot by "
                "slot (greedy or per-request sampling) — incompatible with "
                "num_beams>1; use static batches for beam search")
        if self.decode.stream_block_s > 0 and self.decode.kv_cache_dtype == "int8":
            raise ValueError(
                "decode.stream_block_s (blockwise streaming) keeps a live "
                "float KV cache that is extended in place per block; "
                "int8 kv_cache_dtype quantizes once at prefill and is "
                "incompatible — use it with the exact mode only")
        if self.training.best_metric not in ("loss", "wer"):
            raise ValueError(
                "training.best_metric must be loss | wer, got "
                f"{self.training.best_metric!r}")
        if (self.training.best_metric == "wer"
                and self.training.eval_wer_every_epochs <= 0):
            raise ValueError(
                "training.best_metric='wer' needs in-training WER eval: "
                "set training.eval_wer_every_epochs > 0")
        if self.mesh.pp > 1:
            if self.mesh.sp > 1:
                raise ValueError("mesh.pp and mesh.sp are mutually exclusive")
            if self.model.llm.n_layers % self.mesh.pp != 0:
                raise ValueError(
                    f"llm.n_layers ({self.model.llm.n_layers}) must divide "
                    f"evenly into mesh.pp={self.mesh.pp} stages")
            if self.model.lora.use_lora and self.model.lora.dropout > 0.0:
                # A mesh knob must not silently change training math: LoRA
                # dropout rng is not threaded across pipeline stages, so
                # dropout would be inert under pp (models/llama.py).
                raise ValueError(
                    "mesh.pp > 1 does not support lora.dropout > 0 (dropout "
                    "rng is not threaded across pipeline stages) — set "
                    "model.lora.dropout=0 or use a pp=1 mesh")
        return self


# ---------------------------------------------------------------------------
# Loading: YAML + dotted-path overrides
# ---------------------------------------------------------------------------

def _coerce(value: Any, typ: Any) -> Any:
    """Coerce a YAML/CLI value into the dataclass field type."""
    import typing

    origin = typing.get_origin(typ)
    if origin is tuple:
        args = typing.get_args(typ)
        elem = args[0] if args else str
        if isinstance(value, str):
            value = [v for v in value.replace(",", " ").split() if v]
        elif not isinstance(value, (list, tuple)):
            value = [value]          # scalar override -> 1-tuple
        return tuple(_coerce(v, elem) for v in value)
    if typ is bool:
        if isinstance(value, str):
            return value.lower() in ("1", "true", "yes", "on")
        return bool(value)
    if typ is int:
        return int(value)
    if typ is float:
        return float(value)
    if typ is str:
        return str(value)
    return value


def _build(cls: type, data: dict[str, Any], path: str = "") -> Any:
    """Recursively build a dataclass from a nested dict, rejecting unknown keys."""
    kwargs: dict[str, Any] = {}
    known = {f.name: f for f in fields(cls)}
    for key, value in (data or {}).items():
        if key not in known:
            raise KeyError(f"Unknown config key {path + key!r} for {cls.__name__}")
        f = known[key]
        default = f.default_factory() if f.default_factory is not dataclasses.MISSING else f.default
        if is_dataclass(default):
            if not isinstance(value, dict):
                raise TypeError(f"Config section {path + key!r} must be a mapping")
            kwargs[key] = _build(type(default), value, path=f"{path}{key}.")
        else:
            resolved = _FIELD_TYPES.get((cls, key))
            kwargs[key] = _coerce(value, resolved) if resolved is not None else value
    return cls(**kwargs)


def _resolve_field_types() -> dict[tuple[type, str], Any]:
    """Resolve string annotations to real types once, for every section class."""
    import typing

    out: dict[tuple[type, str], Any] = {}
    for cls in (DataConfig, WhisperConfig, SpeechSSLConfig, ClipConfig,
                ResNetConfig, EfficientNetConfig, AVHubertConfig, LLMConfig,
                LoRAConfig, ModelConfig, TrainingConfig, MeshConfig,
                RuntimeConfig, DecodeConfig, AVSRConfig):
        hints = typing.get_type_hints(cls)
        for f in fields(cls):
            out[(cls, f.name)] = hints.get(f.name)
    return out


_FIELD_TYPES = _resolve_field_types()


def _set_dotted(tree: dict[str, Any], dotted: str, value: Any) -> None:
    parts = dotted.split(".")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
        if not isinstance(node, dict):
            raise TypeError(f"Override {dotted!r} conflicts with scalar at {p!r}")
    node[parts[-1]] = value


def load_config(
    yaml_path: str | Path | None = None,
    overrides: dict[str, Any] | list[str] | None = None,
) -> AVSRConfig:
    """Load the canonical config.

    ``overrides`` may be a dict of dotted paths ({"model.modality": "audio"})
    or a list of "key=value" strings from the CLI. CLI wins over YAML wins
    over defaults — the reference's merge direction (train.py:133-139), minus
    its flat-namespace bug.
    """
    tree: dict[str, Any] = {}
    if yaml_path:
        with open(yaml_path) as fh:
            loaded = yaml.safe_load(fh) or {}
        if not isinstance(loaded, dict):
            raise TypeError(f"{yaml_path}: top level must be a mapping")
        tree = loaded
    if overrides:
        if isinstance(overrides, dict):
            items = overrides.items()
        else:
            items = []
            for s in overrides:
                if "=" not in s:
                    raise ValueError(f"Override {s!r} must be key=value")
                k, v = s.split("=", 1)
                items.append((k.strip(), yaml.safe_load(v)))
        for k, v in items:
            _set_dotted(tree, k, v)
    return _build(AVSRConfig, tree).validate()


def save_config(cfg: AVSRConfig, path: str | Path) -> None:
    """Write the fully-resolved config as YAML (reference src/utils/config.py:198-223)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as fh:
        yaml.safe_dump(to_dict(cfg), fh, sort_keys=False)


def to_dict(cfg: Any) -> dict[str, Any]:
    d = dataclasses.asdict(cfg)

    def _clean(x: Any) -> Any:
        if isinstance(x, dict):
            return {k: _clean(v) for k, v in x.items()}
        if isinstance(x, tuple):
            return list(x)
        return x

    return _clean(d)


def config_json(cfg: AVSRConfig) -> str:
    return json.dumps(to_dict(cfg), indent=2)
