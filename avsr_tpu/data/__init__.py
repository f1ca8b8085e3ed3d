from avsr_tpu.data.dataset import (  # noqa: F401
    ManifestAVSRDataset,
    Sample,
    SyntheticAVSRDataset,
    build_dataset,
)
from avsr_tpu.data.loader import DataLoader, HostBatch, collate, featurize  # noqa: F401
from avsr_tpu.data.manifest import (  # noqa: F401
    ManifestEntry,
    load_labels,
    load_manifest,
    utt_aliases,
    write_manifest,
)
from avsr_tpu.data.tokenizer import ByteTokenizer, HFTokenizer, load_tokenizer  # noqa: F401
