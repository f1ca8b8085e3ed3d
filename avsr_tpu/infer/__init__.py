from avsr_tpu.infer.engine import ServingEngine  # noqa: F401
from avsr_tpu.infer.server import AVSRServer  # noqa: F401
from avsr_tpu.infer.generate import GenOut, beam_search, generate, generate_tokens  # noqa: F401
from avsr_tpu.infer.speculative import (  # noqa: F401
    make_draft_params,
    make_layerskip_draft,
    speculative_generate,
)
from avsr_tpu.infer.streaming import StreamingTranscriber  # noqa: F401
from avsr_tpu.infer.wer import WERAccumulator, edit_distance, wer  # noqa: F401
