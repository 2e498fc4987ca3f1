"""Test-only PyTorch oracle of the Flowtron computation.

A functional (state-dict-driven) CPU implementation of the reference's
math — written from SURVEY.md's reading of reference:flowtron.py — used to
demonstrate the BASELINE parity target (fp32 mel MAE < 1e-3) without the
reference's CUDA-only code. It consumes the torch-format state_dict our
``export_torch_state_dict`` produces, so it exercises the checkpoint
bridge and the model composition at once.

Eval-mode only (no dropout, no masked-norm running stats).
"""

import torch
import torch.nn.functional as F


def _lstm(sd, prefix, input_size, hidden, layers=1, bidirectional=False):
    m = torch.nn.LSTM(input_size, hidden, layers, bidirectional=bidirectional)
    state = {}
    for li in range(layers):
        for suf in ([""] if not bidirectional else ["", "_reverse"]):
            for part in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
                state[f"{part}_l{li}{suf}"] = sd[f"{prefix}.{part}_l{li}{suf}"]
    m.load_state_dict(state)
    m.eval()
    return m


def _linear(sd, prefix, x, bias=True):
    w = sd[f"{prefix}.weight"]
    b = sd.get(f"{prefix}.bias") if bias else None
    return F.linear(x, w, b)


def masked_instance_norm(x, mask, weight, bias, eps=1e-5):
    mask_f = mask.float()
    lengths = mask_f.sum(-1)
    mean = (x * mask_f).sum(-1) / lengths
    var = (((x - mean[..., None]) * mask_f) ** 2).sum(-1) / lengths
    out = (x - mean[..., None]) / torch.sqrt(var[..., None] + eps)
    return out * weight[None, :, None] + bias[None, :, None]


def run_packed(lstm, x_tbf, lens):
    """Packed-sequence LSTM run over time-major input (reference
    run_padded_sequence semantics, incl. sort/unsort)."""
    lens_t = torch.as_tensor(lens)
    order = torch.argsort(lens_t, descending=True, stable=True)
    inv = torch.empty_like(order)
    inv[order] = torch.arange(len(order))
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        x_tbf[:, order], lens_t[order])
    y, _ = lstm(packed)
    y, _ = torch.nn.utils.rnn.pad_packed_sequence(
        y, total_length=x_tbf.shape[0])
    return y[:, inv]


def encode_text(sd, text, speaker_ids, in_lens):
    """(B, Tk) ids -> (Tk, B, text+spk) encoder outputs (eval mode)."""
    emb = F.embedding(text, sd["embedding.weight"]).transpose(1, 2)
    Tk = text.shape[1]
    mask = (torch.arange(Tk)[None] < torch.as_tensor(in_lens)[:, None])
    mask_b1t = mask[:, None, :]

    x = emb
    for i in range(3):
        x = x.masked_fill(~mask_b1t, 0.0)
        x = F.conv1d(x, sd[f"encoder.convolutions.{i}.0.conv.weight"],
                     sd[f"encoder.convolutions.{i}.0.conv.bias"], padding=2)
        x = masked_instance_norm(x, mask_b1t,
                                 sd[f"encoder.convolutions.{i}.1.weight"],
                                 sd[f"encoder.convolutions.{i}.1.bias"])
        x = F.relu(x)

    dim = x.shape[1]
    lstm = _lstm(sd, "encoder.lstm", dim, dim // 2, bidirectional=True)
    y = run_packed(lstm, x.permute(2, 0, 1), in_lens)

    spk = F.embedding(speaker_ids, sd["speaker_embedding.weight"])
    spk = spk[None].expand(y.shape[0], -1, -1)
    return torch.cat([y, spk], dim=2), mask


def attention(sd, prefix, queries, keys_raw, key_mask, attn_prior=None,
              temperature=1.0):
    """queries (T,B,H), keys_raw (Tk,B,D) -> context (B,D,T), attn, logprob."""
    q = _linear(sd, f"{prefix}.query.linear_layer", queries,
                bias=False).transpose(0, 1)
    k = _linear(sd, f"{prefix}.key.linear_layer", keys_raw,
                bias=False).transpose(0, 1)
    v = _linear(sd, f"{prefix}.value.linear_layer", keys_raw,
                bias=False).transpose(0, 1)
    vw = sd[f"{prefix}.v.linear_layer.weight"]  # (1, D)
    scores = torch.tanh(q[:, :, None] + k[:, None]) @ vw.t()
    scores = scores[..., 0] / temperature
    if key_mask is not None:
        scores = scores.masked_fill(~key_mask[:, None, :], -float("inf"))
    attn = torch.softmax(scores, dim=2)
    if attn_prior is not None:
        log_post = torch.log(attn + 1e-20) + torch.log(attn_prior + 1e-20)
        logprob = log_post.clone()
        if key_mask is not None:
            log_post = log_post.masked_fill(~key_mask[:, None, :],
                                            -float("inf"))
        attn = torch.softmax(log_post, dim=2)
    else:
        logprob = torch.log(attn + 1e-8)
    ctx = torch.bmm(attn, v).transpose(1, 2)
    return ctx, attn, logprob


def ar_step_forward(sd, prefix, mel, text, key_mask, out_lens,
                    attn_prior=None):
    """Teacher-forced flow step; mel (T,B,M) -> (mel', log_s, gates)."""
    T, B, M = mel.shape
    H = sd[f"{prefix}.attention_lstm.weight_hh_l0"].shape[1]
    dummy = torch.zeros(1, B, M)
    mel0 = torch.cat([dummy, mel[:-1]], 0)

    att_lstm = _lstm(sd, f"{prefix}.attention_lstm", M, H)
    att_hidden = run_packed(att_lstm, mel0, out_lens)

    ctx, attn, logprob = attention(sd, f"{prefix}.attention_layer",
                                   att_hidden, text, key_mask, attn_prior)
    dec_in = torch.cat([att_hidden, ctx.permute(2, 0, 1)], -1)

    gates = None
    if f"{prefix}.gate_layer.linear_layer.weight" in sd:
        gates = _linear(sd, f"{prefix}.gate_layer.linear_layer", dec_in)

    n_layers = sum(1 for k in sd
                   if k.startswith(f"{prefix}.lstm.weight_ih_l"))
    lstm = _lstm(sd, f"{prefix}.lstm", dec_in.shape[-1], H, n_layers)
    hid = run_packed(lstm, dec_in, out_lens)
    for di in (0, 1):
        hid = torch.tanh(_linear(
            sd, f"{prefix}.dense_layer.layers.{di}.linear_layer", hid))
    out = F.conv1d(hid.permute(1, 2, 0), sd[f"{prefix}.conv.weight"],
                   sd[f"{prefix}.conv.bias"]).permute(2, 0, 1)
    log_s, b = out[:, :, :M], out[:, :, M:]
    return torch.exp(log_s) * mel + b, log_s, gates, attn, logprob


def ar_step_infer(sd, prefix, residual, text, gate_threshold=1e6):
    """Frame-by-frame inverse (reference:flowtron.py:775-828), batch=1."""
    N, B, M = residual.shape
    H = sd[f"{prefix}.attention_lstm.weight_hh_l0"].shape[1]
    att_lstm = _lstm(sd, f"{prefix}.attention_lstm", M, H)
    n_layers = sum(1 for k in sd
                   if k.startswith(f"{prefix}.lstm.weight_ih_l"))
    has_gate = f"{prefix}.gate_layer.linear_layer.weight" in sd

    outputs = []
    out = torch.zeros(1, B, M)
    hc = hc1 = None
    dec_lstm = None
    for i in range(N):
        if i == 0:
            att_h, hc = att_lstm(out)
        else:
            att_h, hc = att_lstm(out, hc)
        ctx, attn, _ = attention(sd, f"{prefix}.attention_layer", att_h,
                                 text, None)
        dec_in = torch.cat([att_h, ctx.permute(2, 0, 1)], -1)
        if dec_lstm is None:
            dec_lstm = _lstm(sd, f"{prefix}.lstm", dec_in.shape[-1], H,
                             n_layers)
        if i == 0:
            hid, hc1 = dec_lstm(dec_in)
        else:
            hid, hc1 = dec_lstm(dec_in, hc1)
        for di in (0, 1):
            hid = torch.tanh(_linear(
                sd, f"{prefix}.dense_layer.layers.{di}.linear_layer", hid))
        o = F.conv1d(hid.permute(1, 2, 0), sd[f"{prefix}.conv.weight"],
                     sd[f"{prefix}.conv.bias"]).permute(2, 0, 1)
        log_s, b = o[:, :, :M], o[:, :, M:]
        out = (residual[i:i + 1] - b) / torch.exp(log_s)
        outputs.append(out)
        if has_gate:
            g = torch.sigmoid(_linear(
                sd, f"{prefix}.gate_layer.linear_layer", dec_in))
            if float(g.max()) > gate_threshold:
                break
    return torch.cat(outputs, 0)


def flowtron_forward(sd, n_flows, mel, speaker_ids, text, in_lens,
                     out_lens, attn_prior=None):
    """Full forward (mel (B,M,T) -> z (T,B,M)), eval mode."""
    with torch.no_grad():
        enc, key_mask = encode_text(sd, text, speaker_ids, in_lens)
        z = mel.permute(2, 0, 1)
        log_s_list, gates, attns, logprobs = [], None, [], []
        for i in range(n_flows):
            prefix = f"flows.{i}" if i % 2 == 0 else f"flows.{i}.ar_step"
            if i % 2 == 0:
                z, log_s, g, attn, lp = ar_step_forward(
                    sd, prefix, z, enc, key_mask, out_lens, attn_prior)
            else:
                # flip + roll (reference:flowtron.py:605-627)
                z = torch.flip(z, (0,))
                pr = torch.flip(attn_prior, (1,)) if attn_prior is not None \
                    else None
                for b in range(z.shape[1]):
                    z[:, b] = z[:, b].roll(int(out_lens[b]), dims=0)
                    if pr is not None:
                        pr[b] = pr[b].roll(int(out_lens[b]), dims=0)
                z, log_s, g, attn, lp = ar_step_forward(
                    sd, prefix, z, enc, key_mask, out_lens, pr)
                for b in range(z.shape[1]):
                    z[:, b] = z[:, b].roll(-int(out_lens[b]), dims=0)
                z = torch.flip(z, (0,))
            log_s_list.append(log_s)
            attns.append(attn)
            logprobs.append(lp)
            if g is not None:
                gates = g
        return z, log_s_list, gates, attns, logprobs


def flowtron_infer(sd, n_flows, residual, speaker_ids, text):
    """Full inference (reference order: reversed flows), batch=1, no gate."""
    with torch.no_grad():
        # infer path: unmasked encoder (reference:flowtron.py:516-525)
        emb = F.embedding(text, sd["embedding.weight"]).transpose(1, 2)
        x = emb
        for i in range(3):
            x = F.conv1d(x, sd[f"encoder.convolutions.{i}.0.conv.weight"],
                         sd[f"encoder.convolutions.{i}.0.conv.bias"],
                         padding=2)
            x = F.instance_norm(x)
            w = sd[f"encoder.convolutions.{i}.1.weight"]
            b = sd[f"encoder.convolutions.{i}.1.bias"]
            x = x * w[None, :, None] + b[None, :, None]
            x = F.relu(x)
        dim = x.shape[1]
        lstm = _lstm(sd, "encoder.lstm", dim, dim // 2, bidirectional=True)
        y, _ = lstm(x.permute(2, 0, 1))
        spk = F.embedding(speaker_ids, sd["speaker_embedding.weight"])
        enc = torch.cat([y, spk[None].expand(y.shape[0], -1, -1)], 2)

        z = residual.permute(2, 0, 1)
        for ri in range(n_flows):
            i = n_flows - 1 - ri
            prefix = f"flows.{i}" if i % 2 == 0 else f"flows.{i}.ar_step"
            if i % 2 == 0:
                z = ar_step_infer(sd, prefix, z, enc)
            else:
                z = torch.flip(
                    ar_step_infer(sd, prefix, torch.flip(z, (0,)), enc),
                    (0,))
        return z.permute(1, 2, 0)
