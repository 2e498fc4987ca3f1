"""Weight-only int8 quantization for AR inference.

The inference scan is HBM-bandwidth-bound on per-step weight streaming
(see ROADMAP.md); storing the flow weights as int8 with per-output-channel
scales halves the streamed bytes. Dequantization happens inside the scan
body (models/layers.resolve_weight places it behind an optimization
barrier so XLA cannot hoist the bf16 copy out of the loop).

Only the flows' large matrices are quantized; embeddings, the text
encoder (runs once per utterance), biases, and the zero-init coupling
head stay in fp32. Quality: symmetric per-channel int8 on LSTM/attention
weights — mel deltas are measured in tests/test_quantize.py.
"""

import jax.numpy as jnp
import numpy as np


def _quantize_matrix(w, a8=False):
    """(in, out) float -> {"q": int8, "s": f32 per-out-channel scale}.

    a8=True marks the leaf for the int8 x int8 MXU path (runtime per-row
    activation quantization in ops/qmm_pallas.py). The marker is an
    empty tuple so it adds no pytree leaves — its *presence* is static
    structure the jitted dot dispatch can branch on.
    """
    w = np.asarray(w, np.float32)
    scale = np.abs(w).max(axis=0) / 127.0
    scale = np.where(scale == 0, 1.0, scale)
    q = np.clip(np.round(w / scale[None, :]), -127, 127).astype(np.int8)
    out = {"q": jnp.asarray(q), "s": jnp.asarray(scale.astype(np.float32))}
    if a8:
        out["a8"] = ()
    return out


def _maybe_quantize(w, min_elems=65536, a8=False):
    if hasattr(w, "ndim") and w.ndim == 2 and w.size >= min_elems:
        return _quantize_matrix(w, a8=a8)
    return w


def quantize_flows_for_inference(params, min_elems=65536, mode="w8"):
    """Return a copy of the param pytree with the flows' big weight
    matrices int8-quantized (for flowtron_infer only — do not train on
    the result). mode: "w8" = weight-only int8; "w8a8" additionally
    runs int8 activations on the MXU (fastest serving mode, slightly
    larger quantization error — both bounded in tests/test_quantize.py).
    """
    a8 = mode == "w8a8"
    out = dict(params)
    flows = []
    for flow in params["flows"]:
        f = {}
        for name, sub in flow.items():
            if name == "lstm" or name == "attention_lstm":
                layers = []
                for lp in sub["layers"]:
                    lp = dict(lp)
                    lp["w_ih"] = _maybe_quantize(lp["w_ih"], min_elems, a8)
                    lp["w_hh"] = _maybe_quantize(lp["w_hh"], min_elems, a8)
                    layers.append(lp)
                f[name] = {"layers": layers}
            elif name == "attention_layer":
                f[name] = {
                    k: {**v, "w": _maybe_quantize(v["w"], min_elems, a8)}
                    for k, v in sub.items()
                }
            elif name == "dense_layer":
                f[name] = {"layers": [
                    {**lp, "w": _maybe_quantize(lp["w"], min_elems, a8)}
                    for lp in sub["layers"]
                ]}
            else:  # conv (zero-init head), gate_layer, attn_cond_layer
                f[name] = sub
        flows.append(f)
    out["flows"] = flows
    return out


def weight_shape(w):
    """Shape of a possibly-quantized weight leaf."""
    return w["q"].shape if isinstance(w, dict) and "q" in w else w.shape
