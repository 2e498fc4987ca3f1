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


def _wavenet(wn, audio_half, spect, n_layers, n_channels):
    """Gated WaveNet producing (log_s, b). audio_half: (B, n_half, T);
    spect: (B, n_mel*n_group, T) upsampled+grouped conditioning."""
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


def _upsample_mel(params, spect, n_group, time_cutoff_samples):
    """ConvTranspose1d(k=1024, stride=256) then trim + group.

    spect: (B, 80, T_mel) -> (B, 80*n_group, T_audio/n_group)
    """
    y = jax.lax.conv_transpose(
        spect, params["upsample"]["w"], strides=(256,), padding="VALID",
        dimension_numbers=("NCH", "IOH", "NCH"))
    y = y + params["upsample"]["b"][None, :, None]
    # trim conv-transpose tail (torch: cutoff = kernel - stride), then to
    # exact audio length
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

def waveglow_forward(params, config, spect, audio):
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
                       config["n_layers"], config["n_channels"])
        log_s, b = out[:, n_half:], out[:, :n_half]
        audio_1 = jnp.exp(log_s) * audio_1 + b
        log_s_list.append(log_s)
        audio_g = jnp.concatenate([audio_0, audio_1], axis=1)

    output_audio.append(audio_g)
    return jnp.concatenate(output_audio, axis=1), log_s_list, log_det_list


def waveglow_infer(params, config, spect, sigma=1.0, key=None):
    """spect (B, 80, T_mel) -> audio (B, T_audio). Exact inverse pass."""
    if key is None:
        key = jax.random.PRNGKey(0)
    n_group = config["n_group"]
    n_flows = config["n_flows"]
    n_early_every = config["n_early_every"]
    n_early_size = config["n_early_size"]

    T_audio = spect.shape[2] * 256
    Tg = T_audio // n_group
    spect_g = _upsample_mel(params, spect, n_group, Tg * n_group)
    spect_g = spect_g[:, :, :Tg]
    B = spect.shape[0]

    # channel count of the innermost (last) flow
    n_remaining = config["n_group"]
    for f in range(n_flows):
        if f % n_early_every == 0 and f > 0:
            n_remaining -= n_early_size

    k_main, *k_early = jax.random.split(key, 1 + n_flows)
    audio_g = sigma * jax.random.normal(k_main, (B, n_remaining, Tg),
                                        spect.dtype)

    for f in reversed(range(n_flows)):
        n_half = audio_g.shape[1] // 2
        audio_0, audio_1 = audio_g[:, :n_half], audio_g[:, n_half:]
        out = _wavenet(params["wn"][f], audio_0, spect_g,
                       config["n_layers"], config["n_channels"])
        log_s, b = out[:, n_half:], out[:, :n_half]
        audio_1 = (audio_1 - b) * jnp.exp(-log_s)
        audio_g = jnp.concatenate([audio_0, audio_1], axis=1)

        W_inv = jnp.linalg.inv(
            params["convinv"][f]["w"].astype(jnp.float32)
        ).astype(audio_g.dtype)
        audio_g = jnp.einsum("ij,bjt->bit", W_inv, audio_g)

        if f % n_early_every == 0 and f > 0:
            z = sigma * jax.random.normal(k_early[f],
                                          (B, n_early_size, Tg), spect.dtype)
            audio_g = jnp.concatenate([z, audio_g], axis=1)

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
        sd = {k.replace("weight_g", "weight_g"): v.numpy()
              for k, v in sd.items()}
        params, config = waveglow_init(jax.random.PRNGKey(0))
        return import_waveglow_torch(params, config, sd), config
    with open(path, "rb") as f:
        payload = pickle.load(f)
    return payload["params"], payload["config"]
