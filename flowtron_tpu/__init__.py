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
