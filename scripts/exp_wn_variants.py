"""Time waveglow_infer's WN implementations (nch / tc / pallas) at the
serving operating point (B=8, 400 mel frames, bf16, chained passes) —
re-check of the round-2 impl study at today's exact shapes, since the
vocoder is now the dominant share of the serving dispatch (133 of
152 ms) and sits at 1.57x the MXU roofline.

Run: python scripts/exp_wn_variants.py  (real TPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from flowtron_tpu.vocoder import waveglow_init
from flowtron_tpu.vocoder.waveglow import waveglow_infer

B, N_FRAMES, PASSES = 8, 400, 4
DT = jnp.bfloat16


def main():
    print("backend:", jax.default_backend())
    wgp, wgc = waveglow_init(jax.random.PRNGKey(1))
    wgp = jax.tree.map(
        lambda x: x.astype(DT) if x.dtype == jnp.float32 else x, wgp)
    key = jax.random.PRNGKey(0)
    mel = (jax.random.normal(key, (B, 80, N_FRAMES))).astype(DT)

    for impl in ("nch", "tc", "pallas"):
        @jax.jit
        def vocode(wgp, mel, impl=impl):
            def one(m, _):
                a = waveglow_infer(wgp, wgc, m, sigma=0.8,
                                   key=jax.random.PRNGKey(1), impl=impl)
                return (m + a[:, :80 * N_FRAMES]
                        .reshape(B, 80, N_FRAMES) * 1e-6).astype(DT), None
            out, _ = jax.lax.scan(one, mel, None, length=PASSES)
            return out

        try:
            float(vocode(wgp, mel).sum())  # compile+warm
            best = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                float(vocode(wgp, mel).sum())
                best = min(best, time.perf_counter() - t0)
            print(f"{impl:8s}: {best / PASSES * 1e3:7.1f} ms/pass",
                  flush=True)
        except Exception as e:
            print(f"{impl:8s}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
