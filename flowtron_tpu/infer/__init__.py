from flowtron_tpu.infer.sampling import (  # noqa: F401
    synthesize, load_model_for_inference, run_inference,
)
