"""WaveGlow-style flow vocoder: mel -> 22.05 kHz waveform.

Capability replacement for the reference's external vocoder submodule
(reference:inference.py:34-50, .gitmodules:1-4; architecture per the
WaveGlow paper, arXiv:1811.00002, and the published waveglow_256channels
checkpoint layout):

- audio squeezed into groups of ``n_group`` samples (channels)
- ``n_flows`` steps of [invertible 1x1 conv -> affine coupling]; the
  coupling's (log_s, t) come from a gated WaveNet stack (dilated convs,
  one fused cond projection) conditioned on upsampled mels
- every ``n_early_every`` flows, ``n_early_size`` channels exit early
- inference = exact inverse from z ~ N(0, sigma^2), fully parallel over
  time (TPU-friendly: everything is large convs on the MXU; no scan)

Weight layout matches torch's WaveGlow state_dict so the published
checkpoint can be imported (see import_waveglow_torch).
"""

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _conv_init(key, out_c, in_c, k, dtype=jnp.float32):
    bound = 1.0 / np.sqrt(in_c * k)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (out_c, in_c, k), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (out_c,), dtype, -bound, bound),
    }


def waveglow_init(key, n_mel_channels=80, n_flows=12, n_group=8,
                  n_early_every=4, n_early_size=2, n_layers=8,
                  n_channels=256, kernel_size=3, dtype=jnp.float32):
    config = dict(n_mel_channels=n_mel_channels, n_flows=n_flows,
                  n_group=n_group, n_early_every=n_early_every,
                  n_early_size=n_early_size, n_layers=n_layers,
                  n_channels=n_channels, kernel_size=kernel_size)
    keys = jax.random.split(key, n_flows * 2 + 1)

    # mel upsampler: ConvTranspose1d(n_mel, n_mel, 1024, stride=256);
    # torch ConvTranspose weight layout is (in, out, k)
    bound = 1.0 / np.sqrt(n_mel_channels * 1024)
    ku, kb = jax.random.split(keys[0])
    params = {
        "upsample": {
            "w": jax.random.uniform(
                ku, (n_mel_channels, n_mel_channels, 1024), dtype,
                -bound, bound),
            "b": jax.random.uniform(kb, (n_mel_channels,), dtype,
                                    -bound, bound),
        },
        "convinv": [],
        "wn": [],
    }

    n_half = n_group // 2
    n_remaining = n_group
    for f in range(n_flows):
        if f % n_early_every == 0 and f > 0:
            n_remaining -= n_early_size
        n_half = n_remaining // 2

        # invertible 1x1: random orthogonal with det forced positive
        q = jnp.linalg.qr(
            jax.random.normal(keys[1 + 2 * f],
                              (n_remaining, n_remaining)))[0]
        det = jnp.linalg.det(q)
        q = jnp.where(det < 0, q.at[:, 0].multiply(-1.0), q)
        params["convinv"].append({"w": q.astype(dtype)})

        wn_key = keys[2 + 2 * f]
        wks = jax.random.split(wn_key, 4 + n_layers * 2)
        wn = {
            "start": _conv_init(wks[0], n_channels, n_half, 1, dtype),
            # zero-init end conv: coupling starts as identity
            "end": {
                "w": jnp.zeros((2 * n_half, n_channels, 1), dtype),
                "b": jnp.zeros((2 * n_half,), dtype),
            },
            # single fused conditioning conv over all layers
            "cond": _conv_init(wks[1], 2 * n_channels * n_layers,
                               n_mel_channels * n_group, 1, dtype),
            "in_layers": [],
            "res_skip_layers": [],
        }
        for l in range(n_layers):
            wn["in_layers"].append(_conv_init(
                wks[4 + 2 * l], 2 * n_channels, n_channels, kernel_size,
                dtype))
            res_skip_c = 2 * n_channels if l < n_layers - 1 else n_channels
            wn["res_skip_layers"].append(_conv_init(
                wks[5 + 2 * l], res_skip_c, n_channels, 1, dtype))
        params["wn"].append(wn)

    return params, config


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

def _conv1d(p, x, dilation=1):
    k = p["w"].shape[-1]
    pad = dilation * (k - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, p["w"], (1,), [(pad, pad)], rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=x.dtype)
    return y + p["b"][None, :, None]


def _wavenet_nch(wn, audio_half, spect, n_layers, n_channels):
    """Reference-shaped gated WaveNet: (B, C, T) layout, XLA convs.
    Kept as the oracle for the matmul-layout implementations below."""
    x = _conv1d(wn["start"], audio_half)
    cond = _conv1d(wn["cond"], spect)  # (B, 2*C*L, T)
    output = jnp.zeros_like(x)
    for l in range(n_layers):
        acts = _conv1d(wn["in_layers"][l], x, dilation=2 ** l)
        c = cond[:, 2 * n_channels * l: 2 * n_channels * (l + 1)]
        acts = acts + c
        t_act = jnp.tanh(acts[:, :n_channels])
        s_act = jax.nn.sigmoid(acts[:, n_channels:])
        z = t_act * s_act
        rs = _conv1d(wn["res_skip_layers"][l], z)
        if l < n_layers - 1:
            x = x + rs[:, :n_channels]
            output = output + rs[:, n_channels:]
        else:
            output = output + rs
    return _conv1d(wn["end"], output)


def _shift_t(x, d):
    """(B, T, C) -> same, rows moved by d with zero fill: out[t] = x[t-d]
    for d > 0 (past), x[t+|d|] for d < 0 (future). Matches zero "same"
    padding of the k=3 dilated conv."""
    T = x.shape[1]
    if d > 0:
        return jnp.pad(x, ((0, 0), (d, 0), (0, 0)))[:, :T]
    return jnp.pad(x, ((0, 0), (0, -d), (0, 0)))[:, -d:]


def _mm1x1(p, x_tc):
    """1x1 conv as a (T, Cin) @ (Cin, Cout) matmul. p['w']: (Cout, Cin, 1)."""
    return (jnp.dot(x_tc, p["w"][:, :, 0].T,
                    preferred_element_type=jnp.float32)
            + p["b"]).astype(x_tc.dtype)


def _wavenet_tc(wn, audio_half, spect, n_layers, n_channels):
    """Time-major gated WaveNet: activations live as (B, T, C) so every
    conv is an MXU matmul with M = B*T rows (the k=3 dilated conv becomes
    one (3C -> 2C) matmul over [x[t-d], x[t], x[t+d]]).

    XLA's NCH conv lowering runs at ~10 TFLOP/s at small batch (ROADMAP
    "Vocoder @ B=1"); this layout is the fix. Numerics: matmul
    accumulation in fp32, residual/skip accumulation in fp32.
    """
    C = n_channels
    dtype = audio_half.dtype
    x = _mm1x1(wn["start"], audio_half.transpose(0, 2, 1))   # (B, T, C)
    cond = _mm1x1(wn["cond"], spect.transpose(0, 2, 1))       # (B, T, 2CL)

    out = jnp.zeros(x.shape[:2] + (0,), jnp.float32)  # placeholder
    for l in range(n_layers):
        d = 2 ** l
        w = wn["in_layers"][l]["w"]                           # (2C, C, 3)
        w_cat = jnp.concatenate([w[:, :, 0].T, w[:, :, 1].T,
                                 w[:, :, 2].T], axis=0)       # (3C, 2C)
        x_in = jnp.concatenate([_shift_t(x, d), x, _shift_t(x, -d)],
                               axis=-1)                       # (B, T, 3C)
        acts = (jnp.dot(x_in, w_cat, preferred_element_type=jnp.float32)
                + wn["in_layers"][l]["b"]
                + cond[..., 2 * C * l: 2 * C * (l + 1)].astype(jnp.float32))
        z = (jnp.tanh(acts[..., :C])
             * jax.nn.sigmoid(acts[..., C:])).astype(dtype)
        rs = (jnp.dot(z, wn["res_skip_layers"][l]["w"][:, :, 0].T,
                      preferred_element_type=jnp.float32)
              + wn["res_skip_layers"][l]["b"])
        if l == 0:
            out = jnp.zeros_like(rs[..., C:] if n_layers > 1 else rs)
        if l < n_layers - 1:
            x = (x.astype(jnp.float32) + rs[..., :C]).astype(dtype)
            out = out + rs[..., C:]
        else:
            out = out + rs
    result = _mm1x1(wn["end"], out.astype(dtype))             # (B, T, 2*nh)
    return result.transpose(0, 2, 1)


def _wavenet_pallas(wn, audio_half, spect, n_layers, n_channels,
                    tile=512, interpret=False):
    """Same computation as _wavenet_tc with each layer's conv + gate +
    res/skip fused into one Pallas kernel (ops/wavenet_pallas.py)."""
    from flowtron_tpu.ops.wavenet_pallas import wn_layer_fused

    C = n_channels
    dtype = audio_half.dtype
    x = _mm1x1(wn["start"], audio_half.transpose(0, 2, 1))   # (B, T, C)
    cond = _mm1x1(wn["cond"], spect.transpose(0, 2, 1))       # (B, T, 2CL)
    B, T, _ = x.shape
    Tp = -(-T // tile) * tile
    pad = Tp - T
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    M = B * Tp

    out = None
    for l in range(n_layers):
        d = 2 ** l
        w = wn["in_layers"][l]["w"]                           # (2C, C, 3)
        w_cat = jnp.concatenate([w[:, :, 0].T, w[:, :, 1].T,
                                 w[:, :, 2].T], axis=0)       # (3C, 2C)
        x_m = _shift_t(x, d).reshape(M, C)
        x_p = _shift_t(x, -d).reshape(M, C)
        cond_l = cond[..., 2 * C * l: 2 * C * (l + 1)]
        if pad:
            cond_l = jnp.pad(cond_l, ((0, 0), (0, pad), (0, 0)))
        last = l == n_layers - 1
        x_new, skip = wn_layer_fused(
            x_m, x.reshape(M, C), x_p, cond_l.reshape(M, 2 * C),
            w_cat, wn["in_layers"][l]["b"],
            wn["res_skip_layers"][l]["w"][:, :, 0].T,
            wn["res_skip_layers"][l]["b"],
            T=T, Tp=Tp, last=last, tile=tile, interpret=interpret)
        out = (skip.astype(jnp.float32) if out is None
               else out + skip.astype(jnp.float32))
        if not last:
            x = x_new.reshape(B, Tp, C)

    result = _mm1x1(wn["end"], out.astype(dtype).reshape(B, Tp, -1))
    return result[:, :T].transpose(0, 2, 1)


def _wavenet(wn, audio_half, spect, n_layers, n_channels, impl="nch"):
    """impl choices, measured on v5e with the fixed upsample (B=8 bf16,
    2x400-frame passes): nch 140 ms, pallas 180 ms, tc 198 ms; at B=1
    all are dispatch-floor-bound (~27-33 ms). XLA's conv lowering wins
    once the transpose-conv upsample (the real round-1 bottleneck,
    ~180 ms) is gone, so nch is the default; tc/pallas are kept as
    selectable implementations and parity oracles."""
    if impl == "auto":
        impl = "nch"
    if impl == "nch":
        return _wavenet_nch(wn, audio_half, spect, n_layers, n_channels)
    if impl == "pallas":
        return _wavenet_pallas(wn, audio_half, spect, n_layers, n_channels)
    if impl == "pallas_interpret":
        return _wavenet_pallas(wn, audio_half, spect, n_layers, n_channels,
                               interpret=True)
    return _wavenet_tc(wn, audio_half, spect, n_layers, n_channels)


def _upsample_mel(params, spect, n_group, time_cutoff_samples):
    """ConvTranspose1d(k=1024, stride=256) then trim + group.

    spect: (B, 80, T_mel) -> (B, 80*n_group, T_audio/n_group)

    The transpose-conv is phase-decomposed into one MXU matmul: because
    stride 256 divides k=1024 into 4 taps, output sample t = 256*m + r
    is sum_j spect[:, m-j] @ W[:, :, r + 256*j] — i.e. each input step
    emits an (out_c, 256) block from 4 causal shifts. XLA's native
    conv_transpose lowering of this shape runs ~180 ms at B=1 on a v5e
    (a stride-256 scatter); the matmul form is ~5 GFLOP and sub-ms.
    """
    w = params["upsample"]["w"]                     # (in_c, out_c, 1024)
    in_c, out_c, _ = w.shape
    B, C, M = spect.shape
    x = spect.transpose(0, 2, 1)                    # (B, M, in_c)
    shifts = [x] + [jnp.pad(x, ((0, 0), (j, 0), (0, 0)))[:, :M]
                    for j in range(1, 4)]
    x4 = jnp.concatenate(shifts, axis=-1)           # (B, M, 4*in_c)
    # (in, out, 4, 256) -> (4, in, out, 256) -> (4*in, out*256); row
    # j*in_c + c_in matches the x4 concatenation order
    w4 = (w.reshape(in_c, out_c, 4, 256).transpose(2, 0, 1, 3)
          .reshape(4 * in_c, out_c * 256))
    y = jnp.dot(x4, w4, preferred_element_type=jnp.float32)
    y = (y.reshape(B, M, out_c, 256).transpose(0, 2, 1, 3)
         .reshape(B, out_c, M * 256)).astype(spect.dtype)
    y = y + params["upsample"]["b"][None, :, None]
    y = y[:, :, :time_cutoff_samples]
    B, C, T = y.shape
    Tg = T // n_group
    y = y[:, :, :Tg * n_group]
    # (B, C, Tg, n_group) -> (B, C*n_group, Tg) matching torch's
    # unfold(2, n_group, n_group).permute(0,2,1,3) layout
    y = y.reshape(B, C, Tg, n_group).transpose(0, 2, 1, 3)
    return y.reshape(B, Tg, C * n_group).transpose(0, 2, 1)


def _squeeze_audio(audio, n_group):
    """(B, T) -> (B, n_group, T//n_group), torch unfold layout."""
    B, T = audio.shape
    Tg = T // n_group
    return audio[:, :Tg * n_group].reshape(B, Tg, n_group).transpose(0, 2, 1)


def _unsqueeze_audio(audio_g):
    """(B, n_group, Tg) -> (B, Tg*n_group)."""
    B, G, Tg = audio_g.shape
    return audio_g.transpose(0, 2, 1).reshape(B, Tg * G)


# ---------------------------------------------------------------------------
# forward (training: audio -> z) and inverse (inference: z -> audio)
# ---------------------------------------------------------------------------

def waveglow_forward(params, config, spect, audio, impl="nch"):
    """audio (B, T), spect (B, 80, T_mel) -> (z, log_s_list, log_det_list)."""
    n_group = config["n_group"]
    n_flows = config["n_flows"]

    audio_g = _squeeze_audio(audio, n_group)
    Tg = audio_g.shape[2]
    spect_g = _upsample_mel(params, spect, n_group, Tg * n_group)
    spect_g = spect_g[:, :, :Tg]

    output_audio = []
    log_s_list, log_det_list = [], []
    for f in range(n_flows):
        if f % config["n_early_every"] == 0 and f > 0:
            output_audio.append(audio_g[:, :config["n_early_size"]])
            audio_g = audio_g[:, config["n_early_size"]:]

        W = params["convinv"][f]["w"]
        audio_g = jnp.einsum("ij,bjt->bit", W, audio_g)
        _, logdet = jnp.linalg.slogdet(W.astype(jnp.float32))
        log_det_list.append(audio_g.shape[0] * audio_g.shape[2] * logdet)

        n_half = audio_g.shape[1] // 2
        audio_0, audio_1 = audio_g[:, :n_half], audio_g[:, n_half:]
        out = _wavenet(params["wn"][f], audio_0, spect_g,
                       config["n_layers"], config["n_channels"], impl=impl)
        log_s, b = out[:, n_half:], out[:, :n_half]
        audio_1 = jnp.exp(log_s) * audio_1 + b
        log_s_list.append(log_s)
        audio_g = jnp.concatenate([audio_0, audio_1], axis=1)

    output_audio.append(audio_g)
    return jnp.concatenate(output_audio, axis=1), log_s_list, log_det_list


def waveglow_n_remaining(config):
    """Channel count of the innermost (last) flow after early outputs."""
    n_remaining = config["n_group"]
    for f in range(config["n_flows"]):
        if f % config["n_early_every"] == 0 and f > 0:
            n_remaining -= config["n_early_size"]
    return n_remaining


def waveglow_infer(params, config, spect, sigma=1.0, key=None, impl="nch"):
    """spect (B, 80, T_mel) -> audio (B, T_audio). Exact inverse pass."""
    if key is None:
        key = jax.random.PRNGKey(0)
    n_flows = config["n_flows"]
    T_audio = spect.shape[2] * 256
    Tg = T_audio // config["n_group"]
    B = spect.shape[0]

    k_main, *k_early = jax.random.split(key, 1 + n_flows)
    z_main = sigma * jax.random.normal(
        k_main, (B, waveglow_n_remaining(config), Tg), spect.dtype)
    z_early = [
        sigma * jax.random.normal(k_early[f],
                                  (B, config["n_early_size"], Tg),
                                  spect.dtype)
        if (f % config["n_early_every"] == 0 and f > 0) else None
        for f in range(n_flows)]
    return waveglow_infer_z(params, config, spect, z_main, z_early,
                            impl=impl)


def waveglow_infer_z(params, config, spect, z_main, z_early, impl="nch"):
    """Inverse pass with externally supplied latents.

    z_main: (B, n_remaining, Tg) innermost latents (sigma already
    applied); z_early: list of n_flows entries, (B, n_early_size, Tg)
    at each early-output flow index, None elsewhere. Splitting this out
    of waveglow_infer lets chunked/streaming synthesis
    (infer/streaming.py) feed position-consistent latents so
    overlapping windows agree exactly.
    """
    n_group = config["n_group"]
    n_flows = config["n_flows"]
    n_early_every = config["n_early_every"]

    T_audio = spect.shape[2] * 256
    Tg = T_audio // n_group
    spect_g = _upsample_mel(params, spect, n_group, Tg * n_group)
    spect_g = spect_g[:, :, :Tg]

    audio_g = z_main

    for f in reversed(range(n_flows)):
        n_half = audio_g.shape[1] // 2
        audio_0, audio_1 = audio_g[:, :n_half], audio_g[:, n_half:]
        out = _wavenet(params["wn"][f], audio_0, spect_g,
                       config["n_layers"], config["n_channels"], impl=impl)
        log_s, b = out[:, n_half:], out[:, :n_half]
        audio_1 = (audio_1 - b) * jnp.exp(-log_s)
        audio_g = jnp.concatenate([audio_0, audio_1], axis=1)

        W_inv = jnp.linalg.inv(
            params["convinv"][f]["w"].astype(jnp.float32)
        ).astype(audio_g.dtype)
        audio_g = jnp.einsum("ij,bjt->bit", W_inv, audio_g)

        if f % n_early_every == 0 and f > 0:
            audio_g = jnp.concatenate([z_early[f], audio_g], axis=1)

    return _unsqueeze_audio(audio_g)


def waveglow_loss(z, log_s_list, log_det_list, sigma=1.0):
    """-log p(x): Gaussian NLL minus flow log-determinants, normalized per
    element (WaveGlow paper convention)."""
    log_s_total = sum(jnp.sum(ls) for ls in log_s_list)
    log_det_total = sum(log_det_list)
    loss = (jnp.sum(z * z) / (2 * sigma * sigma)
            - log_s_total - log_det_total)
    return loss / (z.shape[0] * z.shape[1] * z.shape[2])


# ---------------------------------------------------------------------------
# torch checkpoint bridge (published waveglow_256channels)
# ---------------------------------------------------------------------------

def import_waveglow_torch(params, config, state_dict):
    """Load a torch WaveGlow state_dict (published checkpoint layout:
    upsample.*, convinv.{f}.conv.weight, WN.{f}.{start,end,cond_layer,
    in_layers.{l},res_skip_layers.{l}}.*)."""
    def arr(name):
        if name in state_dict:
            return jnp.asarray(np.asarray(state_dict[name]))
        # fold torch weight_norm: w = g * v / ||v|| (norm over dims 1,2)
        base = name[:-len(".weight")]
        g = np.asarray(state_dict[base + ".weight_g"])
        v = np.asarray(state_dict[base + ".weight_v"])
        norm = np.sqrt((v * v).sum(axis=(1, 2), keepdims=True))
        return jnp.asarray(g * v / norm)

    params["upsample"]["w"] = arr("upsample.weight")
    params["upsample"]["b"] = arr("upsample.bias")
    for f in range(config["n_flows"]):
        # torch convinv weight: (C, C, 1)
        params["convinv"][f]["w"] = arr(f"convinv.{f}.conv.weight")[:, :, 0]
        wn = params["wn"][f]
        for ours, theirs in (("start", "start"), ("end", "end"),
                             ("cond", "cond_layer")):
            wn[ours]["w"] = arr(f"WN.{f}.{theirs}.weight")
            wn[ours]["b"] = arr(f"WN.{f}.{theirs}.bias")
        for l in range(config["n_layers"]):
            for ours, theirs in (("in_layers", "in_layers"),
                                 ("res_skip_layers", "res_skip_layers")):
                wn[ours][l]["w"] = arr(f"WN.{f}.{theirs}.{l}.weight")
                wn[ours][l]["b"] = arr(f"WN.{f}.{theirs}.{l}.bias")
    return params


def load_waveglow(path):
    """Load a vocoder checkpoint: torch .pt or native pickle."""
    import pickle
    if path.endswith((".pt", ".pth")):
        import torch
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        sd = ckpt.get("model", ckpt)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        sd = {k: v.numpy() for k, v in sd.items()}
        params, config = waveglow_init(jax.random.PRNGKey(0))
        return import_waveglow_torch(params, config, sd), config
    with open(path, "rb") as f:
        payload = pickle.load(f)
    return payload["params"], payload["config"]
