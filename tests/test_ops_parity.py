"""Numerical parity of core ops vs torch (the reference's substrate).

These tests pin the exact semantics the model relies on: LSTM cell math
with torch gate order, packed-sequence equivalence via masking, conv1d
same-padding, and masked instance norm.
"""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from flowtron_tpu.ops.lstm import (
    lstm_single_direction, lstm_forward, bilstm_forward,
)
from flowtron_tpu.models.layers import (
    conv1d_apply, linear_apply, masked_instance_norm,
)

RNG = np.random.default_rng(42)


def _np(x):
    return np.asarray(x)


def make_torch_lstm(input_size, hidden, layers=1, bidirectional=False):
    torch.manual_seed(7)
    return torch.nn.LSTM(input_size, hidden, layers,
                         bidirectional=bidirectional)


def torch_lstm_to_params(lstm, layers=1, bidirectional=False):
    """Extract torch LSTM weights into our pytree layout."""
    out_layers = []
    for i in range(layers):
        def grab(suffix):
            return {
                "w_ih": jnp.asarray(
                    getattr(lstm, f"weight_ih_l{i}{suffix}").detach().numpy().T),
                "w_hh": jnp.asarray(
                    getattr(lstm, f"weight_hh_l{i}{suffix}").detach().numpy().T),
                "b_ih": jnp.asarray(
                    getattr(lstm, f"bias_ih_l{i}{suffix}").detach().numpy()),
                "b_hh": jnp.asarray(
                    getattr(lstm, f"bias_hh_l{i}{suffix}").detach().numpy()),
            }
        if bidirectional:
            out_layers.append({"fwd": grab(""), "bwd": grab("_reverse")})
        else:
            out_layers.append(grab(""))
    return {"layers": out_layers}


class TestLSTMParity:
    def test_full_length_single_layer(self):
        T, B, I, H = 11, 3, 8, 16
        lstm = make_torch_lstm(I, H)
        params = torch_lstm_to_params(lstm)
        x = RNG.standard_normal((T, B, I)).astype(np.float32)

        ref, (h_ref, c_ref) = lstm(torch.from_numpy(x))
        ours, _ = lstm_forward(params, jnp.asarray(x))
        np.testing.assert_allclose(_np(ours), ref.detach().numpy(),
                                   atol=1e-5)

    def test_packed_sequence_equivalence(self):
        """Masked scan == pack_padded_sequence on variable lengths."""
        T, B, I, H = 12, 4, 8, 16
        lengths = np.array([12, 9, 5, 2])
        lstm = make_torch_lstm(I, H)
        params = torch_lstm_to_params(lstm)
        x = RNG.standard_normal((T, B, I)).astype(np.float32)
        for b, L in enumerate(lengths):
            x[L:, b] = 0.0

        packed = torch.nn.utils.rnn.pack_padded_sequence(
            torch.from_numpy(x), lengths)
        ref, _ = lstm(packed)
        ref, _ = torch.nn.utils.rnn.pad_packed_sequence(ref, total_length=T)

        mask = jnp.asarray(np.arange(T)[:, None] < lengths[None, :])
        ours, _ = lstm_single_direction(params["layers"][0],
                                        jnp.asarray(x), mask)
        np.testing.assert_allclose(_np(ours), ref.detach().numpy(), atol=1e-5)

    def test_bidirectional_packed(self):
        """Reverse-direction masking == packed biLSTM."""
        T, B, I, H = 10, 3, 6, 8
        lengths = np.array([10, 7, 3])
        lstm = make_torch_lstm(I, H, bidirectional=True)
        params = torch_lstm_to_params(lstm, bidirectional=True)
        x = RNG.standard_normal((T, B, I)).astype(np.float32)
        for b, L in enumerate(lengths):
            x[L:, b] = 0.0

        packed = torch.nn.utils.rnn.pack_padded_sequence(
            torch.from_numpy(x), lengths)
        ref, _ = lstm(packed)
        ref, _ = torch.nn.utils.rnn.pad_packed_sequence(ref, total_length=T)

        mask = jnp.asarray(np.arange(T)[:, None] < lengths[None, :])
        ours = bilstm_forward(params, jnp.asarray(x), mask)
        np.testing.assert_allclose(_np(ours), ref.detach().numpy(), atol=1e-5)

    def test_two_layer(self):
        T, B, I, H = 9, 2, 8, 16
        lstm = make_torch_lstm(I, H, layers=2)
        params = torch_lstm_to_params(lstm, layers=2)
        x = RNG.standard_normal((T, B, I)).astype(np.float32)
        ref, _ = lstm(torch.from_numpy(x))
        ours, _ = lstm_forward(params, jnp.asarray(x))
        np.testing.assert_allclose(_np(ours), ref.detach().numpy(), atol=1e-5)

    def test_carried_state(self):
        """Step-by-step scan with carried (h, c) == one full-sequence run."""
        T, B, I, H = 8, 1, 4, 8
        lstm = make_torch_lstm(I, H)
        params = torch_lstm_to_params(lstm)
        x = RNG.standard_normal((T, B, I)).astype(np.float32)

        full, _ = lstm_forward(params, jnp.asarray(x))

        hc = None
        outs = []
        for t in range(T):
            y, hc_list = lstm_forward(params, jnp.asarray(x[t:t + 1]),
                                      init=[hc] if hc is not None else None)
            hc = hc_list[0]
            outs.append(_np(y)[0])
        np.testing.assert_allclose(np.stack(outs), _np(full), atol=1e-5)


class TestConvLinearParity:
    def test_conv1d_same_padding(self):
        B, Cin, Cout, T, K = 2, 5, 7, 13, 5
        torch.manual_seed(0)
        conv = torch.nn.Conv1d(Cin, Cout, K, padding=(K - 1) // 2)
        x = RNG.standard_normal((B, Cin, T)).astype(np.float32)
        ref = conv(torch.from_numpy(x)).detach().numpy()

        p = {"w": jnp.asarray(conv.weight.detach().numpy()),
             "b": jnp.asarray(conv.bias.detach().numpy()),
             "kernel_size": K}
        ours = conv1d_apply(p, jnp.asarray(x))
        np.testing.assert_allclose(_np(ours), ref, atol=1e-5)

    def test_dilated_conv1d(self):
        B, C, T, K, D = 1, 4, 16, 3, 2
        torch.manual_seed(1)
        conv = torch.nn.Conv1d(C, C, K, padding=D * (K - 1) // 2, dilation=D)
        x = RNG.standard_normal((B, C, T)).astype(np.float32)
        ref = conv(torch.from_numpy(x)).detach().numpy()
        p = {"w": jnp.asarray(conv.weight.detach().numpy()),
             "b": jnp.asarray(conv.bias.detach().numpy()),
             "kernel_size": K}
        ours = conv1d_apply(p, jnp.asarray(x), dilation=D)
        np.testing.assert_allclose(_np(ours), ref, atol=1e-5)

    def test_linear(self):
        torch.manual_seed(2)
        lin = torch.nn.Linear(6, 9)
        x = RNG.standard_normal((4, 6)).astype(np.float32)
        ref = lin(torch.from_numpy(x)).detach().numpy()
        p = {"w": jnp.asarray(lin.weight.detach().numpy().T),
             "b": jnp.asarray(lin.bias.detach().numpy())}
        np.testing.assert_allclose(_np(linear_apply(p, jnp.asarray(x))),
                                   ref, atol=1e-5)


class TestMaskedInstanceNorm:
    def test_matches_manual(self):
        B, C, T = 3, 4, 10
        lengths = np.array([10, 6, 3])
        x = RNG.standard_normal((B, C, T)).astype(np.float32)
        mask = (np.arange(T)[None, None, :] < lengths[:, None, None])

        ours = _np(masked_instance_norm(jnp.asarray(x), jnp.asarray(mask)))

        # manual reference: stats over valid steps only (biased var)
        for b in range(B):
            L = lengths[b]
            seg = x[b, :, :L]
            mean = seg.mean(axis=1, keepdims=True)
            var = ((seg - mean) ** 2).mean(axis=1, keepdims=True)
            expect = (seg - mean) / np.sqrt(var + 1e-5)
            np.testing.assert_allclose(ours[b, :, :L], expect, atol=1e-5)

    def test_affine(self):
        B, C, T = 2, 3, 8
        x = RNG.standard_normal((B, C, T)).astype(np.float32)
        mask = np.ones((B, 1, T), bool)
        w = np.array([2.0, 3.0, 4.0], np.float32)
        b = np.array([1.0, -1.0, 0.0], np.float32)
        out = _np(masked_instance_norm(jnp.asarray(x), jnp.asarray(mask),
                                       weight=jnp.asarray(w),
                                       bias=jnp.asarray(b)))
        plain = _np(masked_instance_norm(jnp.asarray(x), jnp.asarray(mask)))
        np.testing.assert_allclose(out, plain * w[None, :, None]
                                   + b[None, :, None], atol=1e-5)
