from avsr_tpu.models.avsr import (  # noqa: F401
    Batch,
    EncodeOut,
    build_prefix,
    encode,
    forward,
    init_avsr_model,
    pack_segments,
    summarize,
)
from avsr_tpu.models.connectors import get_connector  # noqa: F401
