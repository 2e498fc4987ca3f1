"""Fused AR decoder-cell kernel with VMEM-resident weights.

The AR inference scan (reference:flowtron.py:775-828 — the per-frame
Python loop this framework expresses as lax.scan in models/ar_step.py)
is bound by per-step WEIGHT STREAMING: every scan step re-reads ~53 MB
of flow weights from HBM, and measured streaming runs at an effective
~300-500 GB/s regardless of batch (ROADMAP.md). A v5e core has >=120 MB
of VMEM (probed), so the whole flow's weights FIT ON-CHIP.

This kernel runs the ENTIRE inverse scan for one flow inside a single
pallas_call: the grid iterates over time steps (sequential on TPU), the
weights use constant index maps so Mosaic keeps them resident in VMEM
across all steps, and the LSTM/attention state lives in VMEM scratch
(f32). Per-step HBM traffic drops from ~53 MB to just the frame IO
(z_t in, mel_t/attn_t/gate_t out). Measured on the isolated decoder
matmul: 35.1 -> 15.3 us/step (exp_resident_weight.py).

Semantics are exactly models/ar_step.ar_step_infer for the supported
subset: no attention prior, no cumulative attention, no externally
supplied attention, unquantized weights (weights are cast to bf16 for
the MXU; state and softmax stay f32). Callers fall back to the lax.scan
path otherwise (ar_step_infer(fused=...) handles dispatch).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -1e9


def _as2d(b):
    """(dim,) bias -> (1, dim) for VMEM residency."""
    return b.reshape(1, -1)


def _make_kernel(n_layers, has_gate, M, H, D, Tk, chunk):
    """Kernel closure over static structure. Each grid step runs `chunk`
    sequential timesteps via fori_loop so the resident-weight blocks'
    per-grid-step pipeline bookkeeping amortizes.

    Ref order: z_c, k_proj, vals, key_mask, temp,
               att_w_ih, att_w_hh, att_b, q_w, q_b, v_w,
               [w_ih_l, w_hh_l, b_l] * n_layers,
               [dense_w_l, dense_b_l] * 2,
               conv_w, conv_b, [gate_w, gate_b],
               -> mel_c, attn_c, gate_c,
               scratch: h_att, c_att, [h_l, c_l]*n_layers, prev
    """

    def kernel(*refs):
        it = iter(refs)
        z_ref = next(it)
        kp_ref = next(it)
        vals_ref = next(it)
        mask_ref = next(it)
        temp_ref = next(it)
        att_w_ih = next(it)
        att_w_hh = next(it)
        att_b = next(it)
        q_w = next(it)
        q_b = next(it)
        v_w = next(it)
        lstm_refs = [(next(it), next(it), next(it)) for _ in range(n_layers)]
        dense_refs = [(next(it), next(it)) for _ in range(2)]
        conv_w = next(it)
        conv_b = next(it)
        gate_refs = (next(it), next(it)) if has_gate else None
        mel_ref = next(it)
        attn_ref = next(it)
        gate_ref = next(it)
        h_att = next(it)
        c_att = next(it)
        state_refs = [(next(it), next(it)) for _ in range(n_layers)]
        prev_ref = next(it)

        @pl.when(pl.program_id(0) == 0)
        def _():
            h_att[:] = jnp.zeros_like(h_att)
            c_att[:] = jnp.zeros_like(c_att)
            for h_l, c_l in state_refs:
                h_l[:] = jnp.zeros_like(h_l)
                c_l[:] = jnp.zeros_like(c_l)
            prev_ref[:] = jnp.zeros_like(prev_ref)

        cdt = att_w_ih.dtype  # compute dtype (bf16)

        def lstm_step(x, w_ih, w_hh, b, h_ref, c_ref):
            gates = (
                jnp.dot(x, w_ih[:], preferred_element_type=jnp.float32)
                + jnp.dot(h_ref[:].astype(cdt), w_hh[:],
                          preferred_element_type=jnp.float32)
                + b[:].astype(jnp.float32)
            )
            hdim = gates.shape[-1] // 4
            i = jax.nn.sigmoid(gates[:, :hdim])
            f = jax.nn.sigmoid(gates[:, hdim:2 * hdim])
            g = jnp.tanh(gates[:, 2 * hdim:3 * hdim])
            o = jax.nn.sigmoid(gates[:, 3 * hdim:])
            c_new = f * c_ref[:] + i * g
            h_new = o * jnp.tanh(c_new)
            h_ref[:] = h_new
            c_ref[:] = c_new
            return h_new

        def one_step(ti, _):
            # 1. attention LSTM on the previous output frame
            h_a = lstm_step(prev_ref[:].astype(cdt), att_w_ih, att_w_hh,
                            att_b, h_att, c_att)

            # 2. additive attention over the precomputed text keys
            q = (jnp.dot(h_a.astype(cdt), q_w[:],
                         preferred_element_type=jnp.float32)
                 + q_b[:].astype(jnp.float32))           # (B, D)
            tanh_in = (q[:, None, :].astype(cdt) + kp_ref[:])
            scores = jnp.sum(jnp.tanh(tanh_in).astype(jnp.float32)
                             * v_w[:].astype(jnp.float32)[None],
                             axis=-1)                    # (B, Tk)
            scores = scores / temp_ref[0, 0]
            scores = jnp.where(mask_ref[:] > 0.5, scores, MASK_VALUE)
            scores = scores - jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores)
            attn = e / jnp.sum(e, axis=-1, keepdims=True)  # (B, Tk) f32
            context = jnp.sum(attn[:, :, None].astype(cdt) * vals_ref[:],
                              axis=1).astype(jnp.float32)  # (B, D)

            dec_in = jnp.concatenate([h_a, context], axis=-1)  # (B, H+D)

            # 3. gate logit (last flow only)
            if has_gate:
                gw, gb = gate_refs
                glogit = (jnp.dot(dec_in.astype(cdt), gw[:],
                                  preferred_element_type=jnp.float32)
                          + gb[:].astype(jnp.float32))   # (B, 1)
                gate_ref[ti, 0] = jax.nn.sigmoid(glogit[:, 0])
            else:
                gate_ref[ti, 0] = jnp.zeros_like(gate_ref[ti, 0])

            # 4. decoder LSTM stack
            x = dec_in
            for (w_ih, w_hh, b), (h_ref, c_ref) in zip(lstm_refs,
                                                       state_refs):
                x = lstm_step(x.astype(cdt), w_ih, w_hh, b, h_ref, c_ref)

            # 5. dense (tanh) stack + zero-init coupling head
            for dw, db in dense_refs:
                x = jnp.tanh(jnp.dot(x.astype(cdt), dw[:],
                                     preferred_element_type=jnp.float32)
                             + db[:].astype(jnp.float32))
            out2 = (jnp.dot(x.astype(cdt), conv_w[:],
                            preferred_element_type=jnp.float32)
                    + conv_b[:].astype(jnp.float32))     # (B, 2M)
            log_s = out2[:, :M]
            bb = out2[:, M:]

            # 6. invert the affine: out = (z - b) * exp(-log_s)
            z_t = z_ref[ti].astype(jnp.float32)          # (B, M)
            out = (z_t - bb) * jnp.exp(-log_s)

            prev_ref[:] = out
            mel_ref[ti] = out.astype(mel_ref.dtype)
            attn_ref[ti] = attn.astype(attn_ref.dtype)
            return 0

        jax.lax.fori_loop(0, chunk, one_step, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_flow_infer(weights, residual, k_proj, vals, key_mask, temperature,
                     interpret=False):
    """Run one flow's full inverse scan in a single Pallas kernel.

    Args:
      weights: dict from pack_flow_weights (bf16 2-D arrays + biases).
      residual: (N, B, M) latents, any float dtype.
      k_proj / vals: (B, Tk, D) precomputed attention projections.
      key_mask: (B, Tk) float (1 = valid); pass ones if None upstream.
      temperature: scalar.

    Returns (mel (N, B, M) f32, attn (N, B, Tk) f32, gates (N, B) f32).
    """
    N, B, M = residual.shape
    _, Tk, D = k_proj.shape
    H = weights["att_w_hh"].shape[0]
    n_layers = len(weights["lstm"])
    has_gate = "gate_w" in weights
    if not interpret:
        try:
            interpret = jax.default_backend() != "tpu"
        except Exception:  # pragma: no cover
            interpret = True
    # timesteps per grid step: amortizes the per-grid-step pipeline
    # bookkeeping on the resident weight blocks
    chunk = next(c for c in (16, 10, 8, 5, 4, 2, 1) if N % c == 0)

    cdt = weights["att_w_ih"].dtype  # compute dtype (bf16 in serving)
    args = [
        residual.astype(cdt),
        k_proj.astype(cdt),
        vals.astype(cdt),
        key_mask.astype(jnp.float32),
        jnp.asarray(temperature, jnp.float32).reshape(1, 1),
        weights["att_w_ih"], weights["att_w_hh"], weights["att_b"],
        weights["q_w"], weights["q_b"], weights["v_w"],
    ]
    for (w_ih, w_hh, b) in weights["lstm"]:
        args += [w_ih, w_hh, b]
    for (dw, db) in weights["dense"]:
        args += [dw, db]
    args += [weights["conv_w"], weights["conv_b"]]
    if has_gate:
        args += [weights["gate_w"], weights["gate_b"]]

    def const(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda t, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((chunk, B, M), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),          # z
        const((B, Tk, D)), const((B, Tk, D)), const((B, Tk)),
        pl.BlockSpec((1, 1), lambda t: (0, 0),
                     memory_space=pltpu.SMEM),           # temperature
    ]
    for a in args[5:]:
        in_specs.append(const(a.shape))

    out_specs = (
        pl.BlockSpec((chunk, B, M), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((chunk, B, Tk), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
        # gate as (N, 1, B): a (chunk, B) 2-D block would violate the
        # Mosaic rule that the last two block dims are 8/128-multiples
        # OR equal to the array dims
        pl.BlockSpec((chunk, 1, B), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),
    )
    out_shape = (
        jax.ShapeDtypeStruct((N, B, M), jnp.float32),
        jax.ShapeDtypeStruct((N, B, Tk), jnp.float32),
        jax.ShapeDtypeStruct((N, 1, B), jnp.float32),
    )
    scratch = [pltpu.VMEM((B, H), jnp.float32),          # h_att
               pltpu.VMEM((B, H), jnp.float32)]          # c_att
    for _ in range(n_layers):
        scratch += [pltpu.VMEM((B, H), jnp.float32),
                    pltpu.VMEM((B, H), jnp.float32)]
    scratch.append(pltpu.VMEM((B, M), jnp.float32))      # prev frame

    kernel = _make_kernel(n_layers, has_gate, M, H, D, Tk, chunk)
    mel, attn, gates = pl.pallas_call(
        kernel,
        grid=(N // chunk,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
            # the grid dim carries LSTM state in scratch: sequential
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*args)
    return mel, attn, gates[:, 0, :]


def pack_flow_weights(flow_params, dtype=None):
    """Flatten one flow's pytree into the kernel's weight dict.

    dtype=None keeps the params' own dtype (the serving path passes
    bf16-cast params; the fp32 parity path stays fp32-exact). Returns
    None if the flow is outside the fused kernel's subset (quantized
    leaves or cumulative attention).
    """
    if "attn_cond_layer" in flow_params:
        return None

    def has_quant(tree):
        if isinstance(tree, dict):
            if "q" in tree or "q4" in tree:
                return True
            return any(has_quant(v) for v in tree.values())
        if isinstance(tree, (list, tuple)):
            return any(has_quant(v) for v in tree)
        return False

    if has_quant(flow_params):
        return None

    if dtype is None:
        dtype = flow_params["attention_lstm"]["layers"][0]["w_ih"].dtype

    att = flow_params["attention_lstm"]["layers"][0]
    attn_p = flow_params["attention_layer"]
    out = {
        "att_w_ih": att["w_ih"].astype(dtype),
        "att_w_hh": att["w_hh"].astype(dtype),
        "att_b": _as2d((att["b_ih"] + att["b_hh"]).astype(dtype)),
        "q_w": attn_p["query"]["w"].astype(dtype),
        "q_b": _as2d(attn_p["query"].get(
            "b", jnp.zeros(attn_p["query"]["w"].shape[1])).astype(dtype)),
        # v: (D, 1) -> (1, D) row vector for the lane-wise score reduce
        "v_w": attn_p["v"]["w"][:, 0].astype(dtype).reshape(1, -1),
        "conv_w": flow_params["conv"]["w"].astype(dtype),
        "conv_b": _as2d(flow_params["conv"]["b"].astype(dtype)),
        "lstm": [
            (lp["w_ih"].astype(dtype), lp["w_hh"].astype(dtype),
             _as2d((lp["b_ih"] + lp["b_hh"]).astype(dtype)))
            for lp in flow_params["lstm"]["layers"]
        ],
        "dense": [
            (lp["w"].astype(dtype), _as2d(lp["b"].astype(dtype)))
            for lp in flow_params["dense_layer"]["layers"]
        ],
    }
    if "gate_layer" in flow_params:
        out["gate_w"] = flow_params["gate_layer"]["w"].astype(dtype)
        out["gate_b"] = _as2d(flow_params["gate_layer"]["b"].astype(dtype))
    return out
