"""flowtron_tpu — a TPU-native (JAX/XLA/Pallas) text-to-mel framework.

A from-scratch rebuild of the capabilities of NVIDIA/flowtron (an
autoregressive normalizing-flow TTS model), designed TPU-first:

- compute path: jnp/XLA (MXU matmuls, fused elementwise), lax.scan for the
  autoregressive flows, Pallas kernels for the hot decoder cell
- parallelism: jax.sharding.Mesh + jit shardings (data parallel and beyond),
  replacing the reference's NCCL hooks (reference: distributed.py)
- mixed precision: bfloat16 compute policy instead of AMP GradScaler
- functional core: parameter pytrees + pure functions, no module magic

Reference repo layout is documented in SURVEY.md; citations in docstrings
use ``reference:file:line`` form.
"""

__version__ = "0.1.0"

# Lazy top-level API: `from flowtron_tpu import synthesize` etc. without
# importing jax (or the whole framework) at package-import time — the
# text frontend, for instance, is usable on machines with no accelerator
# stack warmup cost.
_EXPORTS = {
    "load_config": "flowtron_tpu.config",
    "text_to_sequence": "flowtron_tpu.text",
    "sequence_to_text": "flowtron_tpu.text",
    "MelSpectrogram": "flowtron_tpu.audio",
    "Data": "flowtron_tpu.data",
    "flowtron_init": "flowtron_tpu.models",
    "flowtron_forward": "flowtron_tpu.models",
    "flowtron_infer": "flowtron_tpu.models",
    "synthesize": "flowtron_tpu.infer.sampling",
    "stream_tts": "flowtron_tpu.infer.streaming",
    "style_transfer": "flowtron_tpu.infer.style_transfer",
    "train": "flowtron_tpu.train.loop",
    "evaluate": "flowtron_tpu.train.evaluate",
    "SynthesisEngine": "flowtron_tpu.serve",
}
__all__ = sorted(_EXPORTS) + ["__version__"]


def __getattr__(name):
    mod = _EXPORTS.get(name)
    if mod is None:
        raise AttributeError(
            f"module 'flowtron_tpu' has no attribute {name!r}")
    import importlib
    return getattr(importlib.import_module(mod), name)


def __dir__():
    return __all__
