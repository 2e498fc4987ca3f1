from flowtron_tpu.infer.sampling import (  # noqa: F401
    synthesize, load_model_for_inference, run_inference,
)
from flowtron_tpu.infer.streaming import (  # noqa: F401
    StreamingMelSynthesizer, StreamingVocoder, stream_tts, positional_z,
)
