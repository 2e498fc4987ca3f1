"""Loss parity vs torch oracles replicating the reference math exactly."""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from flowtron_tpu.train.loss import (
    flowtron_loss, attention_ctc_loss, _bce_with_logits,
)

RNG = np.random.default_rng(21)


def torch_reference_loss(z, log_s_list, gate_pred, gate_target, out_lens,
                         sigma=1.0, gm=None):
    """The reference's FlowtronLoss math (reference:flowtron.py:200-243)."""
    z_t = torch.from_numpy(z)
    T, B, M = z.shape
    ids = torch.arange(T)
    mask = (ids[None, :] < torch.from_numpy(out_lens)[:, None])
    mask = mask.transpose(0, 1)[..., None].float()
    n_elements = mask.sum()

    log_s_total = sum((torch.from_numpy(ls) * mask).sum()
                      for ls in log_s_list)
    if gm is None:
        zm = z_t * mask
        loss = (zm * zm).sum() / (2 * sigma * sigma) - log_s_total
    else:
        mean, log_var, prob = (torch.from_numpy(a) for a in gm)
        mask4 = mask[..., None]
        zk = z_t[..., None]
        mean_b, log_var_b = mean[None], log_var[None]
        prob_b = prob[None, :, None]
        _z = -(zk - mean_b) ** 2 / (2 * torch.exp(log_var_b))
        _zmax = _z.max(dim=3, keepdim=True)[0]
        _z = prob_b * torch.exp(_z - _zmax) / torch.sqrt(torch.exp(log_var_b))
        _z = _zmax + torch.log(torch.sum(_z, dim=3, keepdim=True))
        loss = -(mask4 * _z).sum() - log_s_total
    loss = loss / (n_elements * M)

    gp = torch.from_numpy(gate_pred) * mask
    gp = gp[..., 0].permute(1, 0)
    gate_loss = F.binary_cross_entropy_with_logits(
        gp, torch.from_numpy(gate_target), reduction="none")
    gate_loss = (gate_loss.permute(1, 0) * mask[:, :, 0]).sum() / n_elements
    return float(loss), float(gate_loss)


def torch_reference_ctc(attn_logprob, in_lens, out_lens, blank_logprob):
    """The reference's per-sample CTC loop (reference:flowtron.py:162-182)."""
    lp = torch.from_numpy(attn_logprob)[:, None]  # (B, 1, T, Tk)
    ctc = torch.nn.CTCLoss(zero_infinity=True)
    padded = F.pad(lp, (1, 0, 0, 0, 0, 0, 0, 0), value=blank_logprob)
    total = 0.0
    for b in range(lp.shape[0]):
        target = torch.arange(1, in_lens[b] + 1)[None]
        cur = padded[b].permute(1, 0, 2)[:out_lens[b], :, :in_lens[b] + 1]
        cur = torch.log_softmax(cur[None], dim=3)[0]
        total += ctc(cur, target,
                     input_lengths=torch.tensor([out_lens[b]]),
                     target_lengths=torch.tensor([in_lens[b]]))
    return float(total / lp.shape[0])


def _fake_outputs(T=9, B=3, M=6, n_flows=2, gm_K=0):
    z = RNG.standard_normal((T, B, M)).astype(np.float32)
    log_s = [0.1 * RNG.standard_normal((T, B, M)).astype(np.float32)
             for _ in range(n_flows)]
    gate = RNG.standard_normal((T, B, 1)).astype(np.float32)
    out_lens = np.array([9, 6, 4])
    gate_target = np.zeros((B, T), np.float32)
    for b, L in enumerate(out_lens):
        gate_target[b, L - 1:] = 1.0
    gm = None
    if gm_K:
        mean = RNG.standard_normal((1, M, gm_K)).astype(np.float32)
        log_var = 0.1 * RNG.standard_normal((1, M, gm_K)).astype(np.float32)
        prob = RNG.uniform(0.1, 1, (B, gm_K)).astype(np.float32)
        prob /= prob.sum(1, keepdims=True)
        gm = (mean, log_var, prob)
    return z, log_s, gate, gate_target, out_lens, gm


class TestNLLGate:
    def test_gaussian_nll_and_gate(self):
        z, log_s, gate, gate_target, out_lens, _ = _fake_outputs()
        ref_nll, ref_gate = torch_reference_loss(
            z, log_s, gate, gate_target, out_lens, sigma=0.8)

        out = (jnp.asarray(z), [jnp.asarray(ls) for ls in log_s],
               jnp.asarray(gate), [None], [None], None, None, None)
        nll, g, _ = flowtron_loss(out, jnp.asarray(gate_target),
                                  jnp.asarray([5, 4, 3]),
                                  jnp.asarray(out_lens), sigma=0.8)
        np.testing.assert_allclose(float(nll), ref_nll, rtol=1e-5)
        np.testing.assert_allclose(float(g), ref_gate, rtol=1e-5)

    def test_gm_nll(self):
        z, log_s, gate, gate_target, out_lens, gm = _fake_outputs(gm_K=4)
        ref_nll, _ = torch_reference_loss(
            z, log_s, gate, gate_target, out_lens, sigma=1.0, gm=gm)
        out = (jnp.asarray(z), [jnp.asarray(ls) for ls in log_s],
               jnp.asarray(gate), [None], [None],
               jnp.asarray(gm[0]), jnp.asarray(gm[1]), jnp.asarray(gm[2]))
        nll, _, _ = flowtron_loss(out, jnp.asarray(gate_target),
                                  jnp.asarray([5, 4, 3]),
                                  jnp.asarray(out_lens), gm_loss=True)
        np.testing.assert_allclose(float(nll), ref_nll, rtol=1e-5)

    def test_bce_matches_torch(self):
        x = RNG.standard_normal((4, 7)).astype(np.float32)
        t = RNG.uniform(0, 1, (4, 7)).astype(np.float32)
        ref = F.binary_cross_entropy_with_logits(
            torch.from_numpy(x), torch.from_numpy(t),
            reduction="none").numpy()
        ours = np.asarray(_bce_with_logits(jnp.asarray(x), jnp.asarray(t)))
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_padding_does_not_change_loss(self):
        z, log_s, gate, gate_target, out_lens, _ = _fake_outputs()
        out = (jnp.asarray(z), [jnp.asarray(ls) for ls in log_s],
               jnp.asarray(gate), [None], [None], None, None, None)
        nll1, g1, _ = flowtron_loss(out, jnp.asarray(gate_target),
                                    jnp.asarray([5, 4, 3]),
                                    jnp.asarray(out_lens))

        # append 4 junk frames of padding
        pad = np.full((4, 3, 6), 99.0, np.float32)
        z2 = np.concatenate([z, pad], 0)
        log_s2 = [np.concatenate([ls, pad], 0) for ls in log_s]
        gate2 = np.concatenate([gate, np.ones((4, 3, 1), np.float32)], 0)
        gt2 = np.concatenate([gate_target, np.ones((3, 4), np.float32)], 1)
        out2 = (jnp.asarray(z2), [jnp.asarray(ls) for ls in log_s2],
                jnp.asarray(gate2), [None], [None], None, None, None)
        nll2, g2, _ = flowtron_loss(out2, jnp.asarray(gt2),
                                    jnp.asarray([5, 4, 3]),
                                    jnp.asarray(out_lens))
        np.testing.assert_allclose(float(nll1), float(nll2), rtol=1e-6)
        np.testing.assert_allclose(float(g1), float(g2), rtol=1e-6)


class TestCTC:
    def test_matches_torch_ctc(self):
        B, T, Tk = 3, 12, 5
        in_lens = np.array([5, 4, 3])
        out_lens = np.array([12, 9, 7])
        attn_logprob = np.log(
            RNG.uniform(0.01, 1, (B, T, Tk)).astype(np.float32))

        ref = torch_reference_ctc(attn_logprob, in_lens, out_lens, -1.0)
        ours = attention_ctc_loss(jnp.asarray(attn_logprob),
                                  jnp.asarray(in_lens),
                                  jnp.asarray(out_lens), blank_logprob=-1.0)
        np.testing.assert_allclose(float(ours), ref, rtol=1e-4)

    def test_blank_logprob_config_value(self):
        B, T, Tk = 2, 8, 4
        in_lens = np.array([4, 3])
        out_lens = np.array([8, 6])
        attn_logprob = np.log(
            RNG.uniform(0.01, 1, (B, T, Tk)).astype(np.float32))
        ref = torch_reference_ctc(attn_logprob, in_lens, out_lens, -8.0)
        ours = attention_ctc_loss(jnp.asarray(attn_logprob),
                                  jnp.asarray(in_lens),
                                  jnp.asarray(out_lens), blank_logprob=-8.0)
        np.testing.assert_allclose(float(ours), ref, rtol=1e-4)

    def test_diagonal_attention_has_low_ctc(self):
        """A perfectly diagonal alignment should score much better than a
        uniform one."""
        B, Tk = 1, 6
        T = 12
        in_lens = np.array([Tk])
        out_lens = np.array([T])
        diag = np.full((B, T, Tk), -9.0, np.float32)
        for t in range(T):
            diag[0, t, min(t * Tk // T, Tk - 1)] = 3.0
        uniform = np.zeros((B, T, Tk), np.float32)
        l_diag = float(attention_ctc_loss(jnp.asarray(diag),
                                          jnp.asarray(in_lens),
                                          jnp.asarray(out_lens)))
        l_unif = float(attention_ctc_loss(jnp.asarray(uniform),
                                          jnp.asarray(in_lens),
                                          jnp.asarray(out_lens)))
        assert l_diag < l_unif
