"""Fused AR decoder-cell kernel with VMEM-resident weights.

The AR inference scan (reference:flowtron.py:775-828 — the per-frame
Python loop this framework expresses as lax.scan in models/ar_step.py)
is bound by per-step WEIGHT STREAMING: every scan step re-reads ~53 MB
of flow weights from HBM. A v5e core has >=120 MB of VMEM (probed), so
the whole flow's weights FIT ON-CHIP — but Mosaic's block pipeline
re-fetches even constant-index_map blocks on every grid step (measured:
a zero-compute kernel over a 13.6 MB const block costs 21 us/step). So
this kernel takes the weights as HBM refs (memory_space=ANY) and DMAs
each into VMEM *scratch* exactly once at grid step 0; scratch persists
across the sequential grid, making the weights genuinely resident.

The grid iterates over 16-step time chunks; the LSTM/attention state
lives in f32 scratch; per-chunk HBM traffic is just the frame IO
(z chunk in, mel/attn/gate chunks out).

early_exit=True additionally skips ALL compute for chunks after every
stream has finished (its gate fired, or its frame index passed the
previous flow's n_valid) — the reference's break out of the frame loop
(reference:flowtron.py:823-825) recovered under static shapes.

Semantics are exactly models/ar_step.ar_step_infer for the supported
subset: no attention prior, no cumulative attention, no externally
supplied attention, unquantized weights (compute in the params' dtype —
bf16 in serving, f32 in parity runs; state and softmax stay f32).
Callers fall back to the lax.scan path otherwise
(ar_step_infer(fused=...) handles dispatch).
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


def _make_kernel(n_layers, has_gate, M, H, D, Tk, chunk, n_resident,
                 early_exit=False):
    """Kernel closure over static structure.

    Ref order:
      z_c (blocked), key_mask, temp (SMEM), thresh (SMEM), n_valid_in,
      [n_resident HBM refs: k_proj, vals, att_w_ih, att_w_hh, att_b,
       q_w, q_b, v_w, (w_ih, w_hh, b) * n_layers, (dense_w, dense_b) * 2,
       conv_w, conv_b, (gate_w, gate_b)?]
      -> mel_c, attn_c, gate_c,
      scratch: [n_resident VMEM copies], h_att, c_att,
               (h_l, c_l) * n_layers, prev, done, all_done, dma_sems
    """

    def kernel(*refs):
        it = iter(refs)
        z_ref = next(it)
        mask_ref = next(it)
        temp_ref = next(it)
        thresh_ref = next(it)
        nvin_ref = next(it)
        hbm_refs = [next(it) for _ in range(n_resident)]
        mel_ref = next(it)
        attn_ref = next(it)
        gate_ref = next(it)
        res = [next(it) for _ in range(n_resident)]  # VMEM weight copies
        h_att = next(it)
        c_att = next(it)
        state_refs = [(next(it), next(it)) for _ in range(n_layers)]
        prev_ref = next(it)
        done_ref = next(it)
        all_done = next(it)
        sems = next(it)

        @pl.when(pl.program_id(0) == 0)
        def _():
            # one-time weight residency: HBM -> VMEM scratch. Started
            # all at once, then waited — the copies overlap each other.
            for i, (src, dst) in enumerate(zip(hbm_refs, res)):
                pltpu.make_async_copy(src, dst, sems.at[i]).start()
            for i, (src, dst) in enumerate(zip(hbm_refs, res)):
                pltpu.make_async_copy(src, dst, sems.at[i]).wait()
            h_att[:] = jnp.zeros_like(h_att)
            c_att[:] = jnp.zeros_like(c_att)
            for h_l, c_l in state_refs:
                h_l[:] = jnp.zeros_like(h_l)
                c_l[:] = jnp.zeros_like(c_l)
            prev_ref[:] = jnp.zeros_like(prev_ref)
            done_ref[:] = jnp.zeros_like(done_ref)
            all_done[0] = 0

        rit = iter(res)
        kp_ref = next(rit)
        vals_ref = next(rit)
        att_w_ih = next(rit)
        att_w_hh = next(rit)
        att_b = next(rit)
        q_w = next(rit)
        q_b = next(rit)
        v_w = next(rit)
        lstm_refs = [(next(rit), next(rit), next(rit))
                     for _ in range(n_layers)]
        dense_refs = [(next(rit), next(rit)) for _ in range(2)]
        conv_w = next(rit)
        conv_b = next(rit)
        gate_refs = (next(rit), next(rit)) if has_gate else None

        cdt = att_w_ih.dtype  # compute dtype
        # hoisted out of the fori_loop: program_id cannot lower inside
        # the loop body under interpret mode
        chunk_base = pl.program_id(0) * chunk

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

            if early_exit:
                g_now = gate_ref[ti, 0] if has_gate \
                    else jnp.zeros((mel_ref.shape[1],), jnp.float32)
                t_glob = (chunk_base + ti).astype(jnp.float32)
                done_ref[0] = jnp.maximum(
                    done_ref[0],
                    jnp.maximum(
                        (g_now > thresh_ref[0, 0]).astype(jnp.float32),
                        (t_glob + 1.0 >= nvin_ref[0]).astype(jnp.float32)))
            return 0

        if not early_exit:
            jax.lax.fori_loop(0, chunk, one_step, 0)
            return

        was_done = all_done[0]  # snapshot: the compute branch updates it

        @pl.when(was_done == 0)
        def _():
            jax.lax.fori_loop(0, chunk, one_step, 0)
            all_done[0] = (jnp.min(done_ref[0]) > 0.5).astype(jnp.int32)

        @pl.when(was_done == 1)
        def _():
            # every stream finished: skip all compute for this chunk
            # (the reference breaks its frame loop here). gate=1 keeps
            # the outside first-hit n_valid computation unchanged.
            mel_ref[:] = jnp.zeros_like(mel_ref)
            attn_ref[:] = jnp.zeros_like(attn_ref)
            gate_ref[:] = jnp.ones_like(gate_ref)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "early_exit"))
def fused_flow_infer(weights, residual, k_proj, vals, key_mask, temperature,
                     interpret=False, early_exit=False, gate_threshold=1e6,
                     n_valid_in=None):
    """Run one flow's full inverse scan in a single Pallas kernel.

    Args:
      weights: dict from pack_flow_weights (2-D arrays + biases).
      residual: (N, B, M) latents, any float dtype.
      k_proj / vals: (B, Tk, D) precomputed attention projections.
      key_mask: (B, Tk) float (1 = valid); pass ones if None upstream.
      temperature: scalar.
      early_exit: once EVERY stream is finished — its gate fired above
        gate_threshold, or its frame index passed n_valid_in — the
        remaining time chunks skip all compute and write zeros. Frames
        at/before each stream's finish point are identical to
        early_exit=False; later frames are unspecified (callers must
        honor n_valid, which they already do).
      gate_threshold / n_valid_in: only consulted when early_exit.

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
    # timesteps per grid step: amortizes per-grid-step pipeline
    # bookkeeping and bounds the early-exit skip granularity
    chunk = next(c for c in (16, 10, 8, 5, 4, 2, 1) if N % c == 0)

    if n_valid_in is None:
        n_valid_in = jnp.full((B,), N, jnp.int32)

    cdt = weights["att_w_ih"].dtype  # compute dtype (bf16 in serving)

    # ---- resident arrays: DMA'd to VMEM scratch once at grid step 0
    resident = [k_proj.astype(cdt), vals.astype(cdt),
                weights["att_w_ih"], weights["att_w_hh"], weights["att_b"],
                weights["q_w"], weights["q_b"], weights["v_w"]]
    for (w_ih, w_hh, b) in weights["lstm"]:
        resident += [w_ih, w_hh, b]
    for (dw, db) in weights["dense"]:
        resident += [dw, db]
    resident += [weights["conv_w"], weights["conv_b"]]
    if has_gate:
        resident += [weights["gate_w"], weights["gate_b"]]
    n_resident = len(resident)

    args = [
        residual.astype(cdt),
        key_mask.astype(jnp.float32),
        jnp.asarray(temperature, jnp.float32).reshape(1, 1),
        jnp.asarray(gate_threshold, jnp.float32).reshape(1, 1),
        jnp.asarray(n_valid_in, jnp.float32).reshape(1, B),
    ] + resident

    in_specs = [
        pl.BlockSpec((chunk, B, M), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM),           # z
        pl.BlockSpec((B, Tk), lambda t: (0, 0),
                     memory_space=pltpu.VMEM),           # key mask
        pl.BlockSpec((1, 1), lambda t: (0, 0),
                     memory_space=pltpu.SMEM),           # temperature
        pl.BlockSpec((1, 1), lambda t: (0, 0),
                     memory_space=pltpu.SMEM),           # gate threshold
        pl.BlockSpec((1, B), lambda t: (0, 0),
                     memory_space=pltpu.VMEM),           # n_valid_in
    ] + [pl.BlockSpec(memory_space=pl.ANY)               # stay in HBM
         for _ in range(n_resident)]

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

    scratch = [pltpu.VMEM(a.shape, a.dtype) for a in resident]
    scratch += [pltpu.VMEM((B, H), jnp.float32),         # h_att
                pltpu.VMEM((B, H), jnp.float32)]         # c_att
    for _ in range(n_layers):
        scratch += [pltpu.VMEM((B, H), jnp.float32),
                    pltpu.VMEM((B, H), jnp.float32)]
    scratch += [pltpu.VMEM((B, M), jnp.float32),         # prev frame
                pltpu.VMEM((1, B), jnp.float32),         # done mask
                pltpu.SMEM((1,), jnp.int32),             # all done
                pltpu.SemaphoreType.DMA((n_resident,))]

    kernel = _make_kernel(n_layers, has_gate, M, H, D, Tk, chunk,
                          n_resident, early_exit)
    mel, attn, gates = pl.pallas_call(
        kernel,
        grid=(N // chunk,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
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
