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


def _quantize_matrix_int4(w, group=128):
    """(in, out) float -> {"q4": int8 (in//2, out) packed nibbles,
    "s": f32 (n_groups, out) per-(input-group, output-channel) scales}.

    Packing layout: row r of the packed array holds unpacked rows r
    (low nibble) and r + in//2 (high nibble), so the in-scan unpack is a
    sign-extending shift pair + one contiguous concat — no interleave
    relayout on the VPU. Group-wise scales (along the input dim) keep
    the 4-bit range usable: symmetric [-7, 7] per (group, out-channel).
    """
    w = np.asarray(w, np.float32)
    n_in, n_out = w.shape
    assert n_in % 2 == 0, n_in
    g = group if n_in % group == 0 else n_in
    n_groups = n_in // g
    wg = w.reshape(n_groups, g, n_out)
    amax = np.abs(wg).max(axis=1)                  # (n_groups, out)
    amax = np.where(amax == 0, 1.0, amax)
    # MSE-optimal clip search: plain max-scales waste the 4-bit grid on
    # outliers (~12% rms error on gaussian weights); clipping to the
    # per-(group, channel) MSE-optimal range cuts that to ~8%.
    best_err = np.full_like(amax, np.inf)
    scale = amax / 7.0
    for alpha in np.linspace(0.55, 1.0, 10):
        s = amax * (alpha / 7.0)
        q = np.clip(np.round(wg / s[:, None, :]), -7, 7)
        err = ((q * s[:, None, :] - wg) ** 2).sum(axis=1)
        better = err < best_err
        best_err = np.where(better, err, best_err)
        scale = np.where(better, s, scale)
    q = np.clip(np.round(wg / scale[:, None, :]), -7, 7)
    q = q.astype(np.int32).reshape(n_in, n_out)
    lo = q[: n_in // 2] & 0xF
    hi = (q[n_in // 2:] & 0xF) << 4
    return {"q4": jnp.asarray((lo | hi).astype(np.int8)),
            "s": jnp.asarray(scale.astype(np.float32))}


def _maybe_quantize(w, min_elems=65536, a8=False, bits=8):
    if hasattr(w, "ndim") and w.ndim == 2 and w.size >= min_elems:
        if bits == 4:
            return _quantize_matrix_int4(w)
        return _quantize_matrix(w, a8=a8)
    return w


def quantize_flows_for_inference(params, min_elems=65536, mode="w8"):
    """Return a copy of the param pytree with the flows' big weight
    matrices quantized (for flowtron_infer only — do not train on the
    result). mode: "w8" = weight-only int8; "w8a8" additionally runs
    int8 activations on the MXU; "w4" = weight-only int4 (two nibbles
    per byte, group-128 scales) — halves the streamed bytes again over
    int8 for the HBM-bound AR scan, at a larger (bounded, tested)
    quantization error. Quality bounds: tests/test_quantize.py.
    """
    a8 = mode == "w8a8"
    bits = 4 if mode == "w4" else 8
    out = dict(params)
    flows = []
    for flow in params["flows"]:
        f = {}
        for name, sub in flow.items():
            if name == "lstm" or name == "attention_lstm":
                layers = []
                for lp in sub["layers"]:
                    lp = dict(lp)
                    lp["w_ih"] = _maybe_quantize(lp["w_ih"], min_elems,
                                                 a8, bits)
                    lp["w_hh"] = _maybe_quantize(lp["w_hh"], min_elems,
                                                 a8, bits)
                    layers.append(lp)
                f[name] = {"layers": layers}
            elif name == "attention_layer":
                f[name] = {
                    k: {**v, "w": _maybe_quantize(v["w"], min_elems,
                                                  a8, bits)}
                    for k, v in sub.items()
                }
            elif name == "dense_layer":
                f[name] = {"layers": [
                    {**lp, "w": _maybe_quantize(lp["w"], min_elems,
                                                a8, bits)}
                    for lp in sub["layers"]
                ]}
            else:  # conv (zero-init head), gate_layer, attn_cond_layer
                f[name] = sub
        flows.append(f)
    out["flows"] = flows
    return out


def weight_shape(w):
    """Shape of a possibly-quantized weight leaf."""
    if isinstance(w, dict) and "q" in w:
        return w["q"].shape
    if isinstance(w, dict) and "q4" in w:
        q4 = w["q4"]
        return (q4.shape[0] * 2, q4.shape[1])
    return w.shape
