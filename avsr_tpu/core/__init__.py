from avsr_tpu.core.config import (  # noqa: F401
    AVSRConfig,
    DataConfig,
    DecodeConfig,
    LLMConfig,
    LoRAConfig,
    MeshConfig,
    ModelConfig,
    RuntimeConfig,
    TrainingConfig,
    WhisperConfig,
    ClipConfig,
    load_config,
    save_config,
)
from avsr_tpu.core.logging import (  # noqa: F401
    CSVLogger,
    LossStabilityMonitor,
    ThroughputMeter,
    setup_logging,
)
from avsr_tpu.core.registry import CONNECTORS, DATASETS, SCHEDULES  # noqa: F401
