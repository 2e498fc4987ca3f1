"""Parity against the reference's ACTUAL torch code (round-4 verdict #1).

Every other parity test in this suite compares against
tests/oracles/torch_flowtron.py — a hand-written reimplementation, which
cannot catch a misreading of the reference shared by the oracle and the
JAX code. This module closes that hole: it imports
/root/reference/flowtron.py itself (with a two-line CPU shim for its
CUDA hard-codings at reference:flowtron.py:34,48,785), loads our
exported reference-format state_dict via ``load_state_dict(strict=True)``
— which also proves the torch bridge's name/layout map against the real
module tree — and compares:

  (a) ``Flowtron.forward``    z / log_s / gate logits (reference:flowtron.py:870-899)
  (b) ``Flowtron.infer``      mel + gate-break frame count (reference:flowtron.py:901-930,775-828)
  (c) ``FlowtronLoss``        nll / gate / ctc values    (reference:flowtron.py:185-275)

for 1-flow, 2-flow, Gaussian-mixture, and cumulative-attention configs
at tiny dims, plus the shipped flagship dims (config.json:49-66).
"""

import importlib.util
import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from flowtron_tpu.models import flowtron_init, flowtron_forward, \
    flowtron_infer
from flowtron_tpu.train.checkpoints import export_torch_state_dict
from flowtron_tpu.train.loss import flowtron_loss

REF_PATH = "/root/reference/flowtron.py"

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.exists(REF_PATH),
    reason="reference checkout not available")]


@pytest.fixture(scope="module")
def ref():
    """Import the reference's flowtron.py with the CPU shim.

    The reference hard-codes ``torch.cuda.LongTensor`` /
    ``torch.cuda.FloatTensor`` in its mask helpers and inference dummy
    frame (reference:flowtron.py:34,48,785) — the only CUDA couplings;
    aliasing them to the CPU types makes the whole module runnable."""
    torch.cuda.LongTensor = torch.LongTensor
    torch.cuda.FloatTensor = torch.FloatTensor
    spec = importlib.util.spec_from_file_location(
        "reference_flowtron", REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


SMALL = dict(n_speakers=3, n_speaker_dim=8, n_text=185, n_text_dim=16,
             n_mel_channels=8, n_hidden=16, n_attn_channels=8,
             n_lstm_layers=2, mel_encoder_n_hidden=8)


def _build(ref, dims, n_flows, seed=0, **kw):
    """Init our params, export, strict-load into the reference model."""
    defaults = dict(use_gate_layer=True, n_components=0,
                    fixed_gaussian=True, mean_scale=0.0,
                    dummy_speaker_embedding=False, use_cumm_attention=False)
    defaults.update(kw)
    params, config = flowtron_init(jax.random.PRNGKey(seed),
                                   n_flows=n_flows, **dims, **defaults)
    # non-trivial coupling (the conv is zero-init = identity flow)
    for i, f in enumerate(params["flows"]):
        k = jax.random.fold_in(jax.random.PRNGKey(seed + 1), i)
        f["conv"]["w"] = 0.05 * jax.random.normal(k, f["conv"]["w"].shape)
        f["conv"]["b"] = 0.01 * jax.random.normal(
            jax.random.fold_in(k, 1), f["conv"]["b"].shape)
    sd = {k: torch.from_numpy(np.array(v))
          for k, v in export_torch_state_dict(params).items()}
    model = ref.Flowtron(n_flows=n_flows, **dims, **defaults)
    model.load_state_dict(sd, strict=True)  # raises on any name mismatch
    model.eval()
    return params, config, model


def _forward_inputs(M, seed=7, B=3, T=14, Tk=9):
    rng = np.random.default_rng(seed)
    mel = rng.standard_normal((B, M, T)).astype(np.float32)
    text = rng.integers(1, 185, (B, Tk))
    sids = np.arange(B) % 3
    # in_lens descending: the reference's pack_padded_sequence uses
    # enforce_sorted=True and its DataCollate sorts by text length
    in_lens = np.linspace(Tk, max(2, Tk - 2 * B), B).astype(np.int64)
    out_lens = np.linspace(T, max(3, T - 3 * B), B).astype(np.int64)
    for b in range(B):
        mel[b, :, out_lens[b]:] = 0
        text[b, in_lens[b]:] = 0
    prior = rng.uniform(0.05, 1.0, (B, T, Tk)).astype(np.float32)
    prior /= prior.sum(-1, keepdims=True)
    return mel, text, sids, in_lens, out_lens, prior


def _compare_forward(out_ours, out_ref, out_lens, n_flows, atol):
    z_o, log_s_o, gate_o = out_ours[0], out_ours[1], out_ours[2]
    z_r, log_s_r, gate_r = out_ref[0], out_ref[1], out_ref[2]
    for b in range(len(out_lens)):
        L = out_lens[b]
        np.testing.assert_allclose(np.asarray(z_o)[:L, b],
                                   z_r[:L, b].numpy(), atol=atol)
        np.testing.assert_allclose(np.asarray(gate_o)[:L, b],
                                   gate_r[:L, b].numpy(), atol=atol)
        for i in range(n_flows):
            np.testing.assert_allclose(np.asarray(log_s_o[i])[:L, b],
                                       log_s_r[i][:L, b].numpy(), atol=atol)


def _gate_target(out_lens, T):
    gt = np.zeros((len(out_lens), T), np.float32)
    for b in range(len(out_lens)):
        gt[b, out_lens[b] - 1:] = 1.0
    return gt


class TestReferenceCodeParity2Flow:
    @pytest.fixture(scope="class")
    def built(self, ref):
        return _build(ref, SMALL, n_flows=2)

    def test_forward_and_loss(self, ref, built):
        """(a) + (c): forward tensors match the reference's executed
        forward; our losses match the reference's own FlowtronLoss run
        on ITS outputs (NLL normalization, gate double-mask, CTC with
        the backward-flow flip/roll, blank_logprob=-8 as shipped)."""
        params, config, model = built
        M = SMALL["n_mel_channels"]
        mel, text, sids, in_lens, out_lens, prior = _forward_inputs(M)

        out_ours = flowtron_forward(
            params, config, jnp.asarray(mel), jnp.asarray(sids),
            jnp.asarray(text), jnp.asarray(in_lens), jnp.asarray(out_lens),
            attn_prior=jnp.asarray(prior))
        with torch.no_grad():
            # clones: the reference mutates mel/prior in place (back-step
            # roll, masked_fill_)
            out_ref = model(torch.from_numpy(mel.copy()),
                            torch.from_numpy(sids),
                            torch.from_numpy(text),
                            torch.from_numpy(in_lens),
                            torch.from_numpy(out_lens),
                            torch.from_numpy(prior.copy()))
        _compare_forward(out_ours, out_ref, out_lens, 2, atol=1e-5)

        gt = _gate_target(out_lens, mel.shape[2])
        crit = ref.FlowtronLoss(sigma=1.0, gm_loss=False, gate_loss=True,
                                use_ctc_loss=True, blank_logprob=-8)
        with torch.no_grad():
            ref_for_loss = out_ref[:4] + (
                [a.clone() for a in out_ref[4]],) + out_ref[5:]
            nll_r, gate_r, ctc_r = crit(
                ref_for_loss, torch.from_numpy(gt),
                torch.from_numpy(in_lens), torch.from_numpy(out_lens))
        nll_o, gate_o, ctc_o = flowtron_loss(
            out_ours, jnp.asarray(gt), jnp.asarray(in_lens),
            jnp.asarray(out_lens), sigma=1.0, gate_loss=True,
            use_ctc_loss=True, blank_logprob=-8.0)
        np.testing.assert_allclose(float(nll_o), float(nll_r), atol=1e-5)
        np.testing.assert_allclose(float(gate_o), float(gate_r), atol=1e-5)
        np.testing.assert_allclose(float(ctc_o), float(ctc_r), atol=1e-4)

    def test_infer_mel(self, built):
        """(b): inverse pass matches the reference's executed per-frame
        python loop (BASELINE target mel MAE < 1e-3; achieved ~1e-8)."""
        params, config, model = built
        rng = np.random.default_rng(8)
        M, N, Tk = SMALL["n_mel_channels"], 12, 6
        residual = (rng.standard_normal((1, M, N)) * 0.5).astype(np.float32)
        text = rng.integers(1, 185, (1, Tk))
        sids = np.array([1])
        with torch.no_grad():
            mel_ref, _ = model.infer(
                torch.from_numpy(residual.copy()), torch.from_numpy(sids),
                torch.from_numpy(text), temperature=1.0, gate_threshold=1e6)
        mel_ours, _, n_valid = flowtron_infer(
            params, config, jnp.asarray(residual), jnp.asarray(sids),
            jnp.asarray(text), gate_threshold=1e6)
        assert int(n_valid[0]) == N
        mae = np.abs(np.asarray(mel_ours) - mel_ref.numpy()).mean()
        assert mae < 1e-3, f"mel MAE {mae} vs reference code"
        assert mae < 1e-6

    def test_infer_gate_break_semantics(self, built):
        """The reference breaks its frame loop the step AFTER the gate
        sigmoid crosses the threshold (output appended first,
        reference:flowtron.py:821-825) and the remaining flows consume
        the truncated residual. Our static-shape n_valid must equal the
        reference's produced frame count, and the mel must match on
        those frames."""
        params, config, model = built
        rng = np.random.default_rng(9)
        M, N, Tk = SMALL["n_mel_channels"], 16, 6
        residual = (rng.standard_normal((1, M, N)) * 0.5).astype(np.float32)
        text = rng.integers(1, 185, (1, Tk))
        sids = np.array([2])
        # chosen so the random-weight gate fires MID-sequence (4 of 16
        # frames at this seed) — a trivial frame-0 or never-fires case
        # would not exercise the truncated-residual handoff to flow 0
        thr = 0.8
        with torch.no_grad():
            mel_ref, _ = model.infer(
                torch.from_numpy(residual.copy()), torch.from_numpy(sids),
                torch.from_numpy(text), temperature=1.0,
                gate_threshold=thr)
        n_ref = mel_ref.shape[2]
        assert 1 < n_ref < N  # mid-sequence: the comparison is non-trivial
        mel_ours, _, n_valid = flowtron_infer(
            params, config, jnp.asarray(residual), jnp.asarray(sids),
            jnp.asarray(text), gate_threshold=thr)
        assert int(n_valid[0]) == n_ref
        mae = np.abs(np.asarray(mel_ours)[:, :, :n_ref]
                     - mel_ref.numpy()).mean()
        assert mae < 1e-5, f"gated-prefix mel MAE {mae}"


class TestReferenceCodeParity1Flow:
    def test_forward_and_infer(self, ref):
        params, config, model = _build(ref, SMALL, n_flows=1, seed=2)
        M = SMALL["n_mel_channels"]
        mel, text, sids, in_lens, out_lens, _ = _forward_inputs(M, seed=10)
        out_ours = flowtron_forward(
            params, config, jnp.asarray(mel), jnp.asarray(sids),
            jnp.asarray(text), jnp.asarray(in_lens), jnp.asarray(out_lens))
        with torch.no_grad():
            out_ref = model(torch.from_numpy(mel.copy()),
                            torch.from_numpy(sids), torch.from_numpy(text),
                            torch.from_numpy(in_lens),
                            torch.from_numpy(out_lens), None)
        _compare_forward(out_ours, out_ref, out_lens, 1, atol=1e-5)

        rng = np.random.default_rng(11)
        residual = (rng.standard_normal((1, M, 10)) * 0.5).astype(np.float32)
        text1 = rng.integers(1, 185, (1, 5))
        with torch.no_grad():
            mel_ref, _ = model.infer(
                torch.from_numpy(residual.copy()),
                torch.from_numpy(np.array([0])), torch.from_numpy(text1),
                gate_threshold=1e6)
        mel_ours, _, _ = flowtron_infer(
            params, config, jnp.asarray(residual),
            jnp.asarray(np.array([0])), jnp.asarray(text1),
            gate_threshold=1e6)
        assert np.abs(np.asarray(mel_ours) - mel_ref.numpy()).mean() < 1e-6


class TestReferenceCodeParityGM:
    def test_forward_gm_outputs_and_loss(self, ref):
        """Gaussian-mixture config: MelEncoder (padded-mean quirk),
        fixed one-hot mean/log_var buffers (overwritten by the strict
        load, so both sides use OUR buffers), GM log-sum-exp NLL
        (reference:flowtron.py:217-231,312-450).

        n_mel_channels must be 80 here: the reference's MelEncoder
        hard-codes its input width to 80 (reference:flowtron.py:379)
        regardless of the configured mel count."""
        dims = dict(SMALL, n_mel_channels=80)
        params, config, model = _build(
            ref, dims, n_flows=2, seed=4, n_components=3)
        M = dims["n_mel_channels"]
        mel, text, sids, in_lens, out_lens, _ = _forward_inputs(M, seed=12)
        out_ours = flowtron_forward(
            params, config, jnp.asarray(mel), jnp.asarray(sids),
            jnp.asarray(text), jnp.asarray(in_lens), jnp.asarray(out_lens))
        with torch.no_grad():
            out_ref = model(torch.from_numpy(mel.copy()),
                            torch.from_numpy(sids), torch.from_numpy(text),
                            torch.from_numpy(in_lens),
                            torch.from_numpy(out_lens), None)
        _compare_forward(out_ours, out_ref, out_lens, 2, atol=1e-5)
        for ours, theirs in zip(out_ours[5:8], out_ref[5:8]):  # mean/lv/prob
            np.testing.assert_allclose(np.asarray(ours),
                                       theirs.numpy(), atol=1e-5)

        gt = _gate_target(out_lens, mel.shape[2])
        crit = ref.FlowtronLoss(sigma=1.0, gm_loss=True, gate_loss=True)
        with torch.no_grad():
            nll_r, gate_r, _ = crit(out_ref, torch.from_numpy(gt),
                                    torch.from_numpy(in_lens),
                                    torch.from_numpy(out_lens))
        nll_o, gate_o, _ = flowtron_loss(
            out_ours, jnp.asarray(gt), jnp.asarray(in_lens),
            jnp.asarray(out_lens), sigma=1.0, gm_loss=True, gate_loss=True)
        np.testing.assert_allclose(float(nll_o), float(nll_r), atol=1e-5)
        np.testing.assert_allclose(float(gate_o), float(gate_r), atol=1e-5)


class TestReferenceCodeParityCummAttention:
    def test_forward(self, ref):
        """use_cumm_attention: the AttentionConditioningLayer gates the
        keys per frame (reference:flowtron.py:696-723); exercises the
        location_conv_* bridge names. (No prior here: the reference's
        cumm path broadcasts a full-length prior per frame — unusable.)"""
        params, config, model = _build(
            ref, SMALL, n_flows=2, seed=5, use_cumm_attention=True)
        M = SMALL["n_mel_channels"]
        mel, text, sids, in_lens, out_lens, _ = _forward_inputs(
            M, seed=13, B=2, T=10, Tk=7)
        out_ours = flowtron_forward(
            params, config, jnp.asarray(mel), jnp.asarray(sids),
            jnp.asarray(text), jnp.asarray(in_lens), jnp.asarray(out_lens))
        with torch.no_grad():
            out_ref = model(torch.from_numpy(mel.copy()),
                            torch.from_numpy(sids), torch.from_numpy(text),
                            torch.from_numpy(in_lens),
                            torch.from_numpy(out_lens), None)
        _compare_forward(out_ours, out_ref, out_lens, 2, atol=1e-5)


class TestReferenceCodeParityGradients:
    """(d) training-step gradients: d(nll + gate + 0.5*ctc)/d(params)
    computed by torch autograd through the reference's ACTUAL model +
    FlowtronLoss vs jax.grad of ours, compared parameter-by-parameter
    through the bridge's name map. Forward parity alone cannot catch a
    backward-only divergence (e.g. a stop_gradient where the reference
    backpropagates, or CTC zero_infinity grad handling); this pins the
    actual quantities the reference trains with
    (reference:flowtron.py:185-275,870-899 + torch autograd)."""

    def test_gradients(self, ref, monkeypatch):
        # The reference's Encoder mutates its activation in place
        # (x.masked_fill_, reference:flowtron.py:501) and eval-mode
        # F.dropout returns its input UNCLONED, so backward through the
        # reference in eval mode trips torch's in-place check (in train
        # mode dropout copies, which is why the reference trains fine).
        # Shim dropout to clone its identity output — numerically a
        # no-op, restores a legal autograd graph. Dropout stays OFF on
        # both sides: deterministic gradients.
        orig_dropout = torch.nn.functional.dropout

        def dropout_clone(x, p=0.5, training=False, inplace=False):
            out = orig_dropout(x, p, training, inplace)
            return out.clone() if out is x else out

        monkeypatch.setattr(torch.nn.functional, "dropout", dropout_clone)

        params, config, model = _build(ref, SMALL, n_flows=2, seed=3)
        M = SMALL["n_mel_channels"]
        mel, text, sids, in_lens, out_lens, prior = _forward_inputs(
            M, seed=16)
        gt = _gate_target(out_lens, mel.shape[2])

        def total(p):
            out = flowtron_forward(
                p, config, jnp.asarray(mel), jnp.asarray(sids),
                jnp.asarray(text), jnp.asarray(in_lens),
                jnp.asarray(out_lens), attn_prior=jnp.asarray(prior))
            nll, gate, ctc = flowtron_loss(
                out, jnp.asarray(gt), jnp.asarray(in_lens),
                jnp.asarray(out_lens), sigma=1.0, gate_loss=True,
                use_ctc_loss=True, blank_logprob=-8.0)
            return nll + gate + 0.5 * ctc

        grads = jax.jit(jax.grad(total))(params)
        grads_named = export_torch_state_dict(grads)

        crit = ref.FlowtronLoss(sigma=1.0, gm_loss=False, gate_loss=True,
                                use_ctc_loss=True, blank_logprob=-8)
        model.zero_grad()
        out_ref = model(torch.from_numpy(mel.copy()),
                        torch.from_numpy(sids), torch.from_numpy(text),
                        torch.from_numpy(in_lens),
                        torch.from_numpy(out_lens),
                        torch.from_numpy(prior.copy()))
        ref_for_loss = out_ref[:4] + (
            [a.clone() for a in out_ref[4]],) + out_ref[5:]
        nll_r, gate_r, ctc_r = crit(ref_for_loss, torch.from_numpy(gt),
                                    torch.from_numpy(in_lens),
                                    torch.from_numpy(out_lens))
        (nll_r + gate_r + 0.5 * ctc_r).backward()

        checked = self._compare_named_grads(model, grads_named)
        assert checked > 50  # every flow/encoder/embedding/gate tensor

    @staticmethod
    def _compare_named_grads(model, grads_named):
        checked = 0
        for name, p in model.named_parameters():
            assert name in grads_named, name
            g_ref = p.grad
            assert g_ref is not None, f"reference grad missing for {name}"
            g_ours = np.asarray(grads_named[name])
            scale = max(1.0, float(np.abs(g_ref.numpy()).max()))
            np.testing.assert_allclose(
                g_ours, g_ref.numpy(), atol=2e-5 * scale,
                err_msg=f"grad mismatch: {name}")
            checked += 1
        return checked

    def test_gradients_gm_learnable(self, ref, monkeypatch):
        """Gaussian-mixture config with fixed_gaussian=False: pins the
        MelEncoder, prob/mean/log_var layer, and GM log-sum-exp NLL
        gradients (reference:flowtron.py:217-231,312-450) that the
        2-flow test never touches."""
        orig_dropout = torch.nn.functional.dropout

        def dropout_clone(x, p=0.5, training=False, inplace=False):
            out = orig_dropout(x, p, training, inplace)
            return out.clone() if out is x else out

        monkeypatch.setattr(torch.nn.functional, "dropout", dropout_clone)

        dims = dict(SMALL, n_mel_channels=80)  # MelEncoder hard-codes 80
        params, config, model = _build(ref, dims, n_flows=2, seed=7,
                                       n_components=3,
                                       fixed_gaussian=False)
        mel, text, sids, in_lens, out_lens, _ = _forward_inputs(
            80, seed=17)
        gt = _gate_target(out_lens, mel.shape[2])

        def total(p):
            out = flowtron_forward(
                p, config, jnp.asarray(mel), jnp.asarray(sids),
                jnp.asarray(text), jnp.asarray(in_lens),
                jnp.asarray(out_lens))
            nll, gate, _ = flowtron_loss(
                out, jnp.asarray(gt), jnp.asarray(in_lens),
                jnp.asarray(out_lens), sigma=1.0, gm_loss=True,
                gate_loss=True)
            return nll + gate

        grads_named = export_torch_state_dict(
            jax.jit(jax.grad(total))(params))

        crit = ref.FlowtronLoss(sigma=1.0, gm_loss=True, gate_loss=True)
        model.zero_grad()
        out_ref = model(torch.from_numpy(mel.copy()),
                        torch.from_numpy(sids), torch.from_numpy(text),
                        torch.from_numpy(in_lens),
                        torch.from_numpy(out_lens), None)
        nll_r, gate_r, _ = crit(out_ref, torch.from_numpy(gt),
                                torch.from_numpy(in_lens),
                                torch.from_numpy(out_lens))
        (nll_r + gate_r).backward()
        assert self._compare_named_grads(model, grads_named) > 60


class TestReferenceInvertibilityCheckQuirk:
    def test_reference_test_invertibility_is_broken(self, ref,
                                                    monkeypatch):
        """SURVEY §2.12 / PARITY 'quirks fixed': the reference's own
        built-in invariant check ALWAYS raises — executed here to prove
        the claim (with .cuda() on its in_lens shimmed to identity; on
        GPU that line works and the same failures follow). 1-flow hits
        the documented 7-from-8 unpack bug
        (reference:flowtron.py:945-947 vs 899); 2-flow dies even
        earlier because it passes out_lens=None into AR_Back_Step's
        per-sample roll (reference:flowtron.py:611). Our working
        equivalent is the invertibility oracle
        (models/flowtron.py:flowtron_test_invertibility), pinned at
        ~2e-6 flagship fp32 in test_model/test_parity_full_model."""
        monkeypatch.setattr(torch.Tensor, "cuda",
                            lambda self, *a, **k: self)
        rng = np.random.default_rng(18)
        residual = (rng.standard_normal((1, SMALL["n_mel_channels"], 8))
                    * 0.5).astype(np.float32)
        text = rng.integers(1, 185, (1, 5))

        _, _, model1 = _build(ref, SMALL, n_flows=1, seed=8)
        with torch.no_grad(), pytest.raises(ValueError, match="unpack"):
            model1.test_invertibility(
                torch.from_numpy(residual),
                torch.from_numpy(np.array([0])), torch.from_numpy(text))

        _, _, model2 = _build(ref, SMALL, n_flows=2, seed=8)
        with torch.no_grad(), pytest.raises(TypeError,
                                            match="subscriptable"):
            model2.test_invertibility(
                torch.from_numpy(residual),
                torch.from_numpy(np.array([0])), torch.from_numpy(text))


FLAGSHIP = dict(n_speakers=3, n_speaker_dim=128, n_text=185,
                n_text_dim=512, n_mel_channels=80, n_hidden=1024,
                n_attn_channels=640, n_lstm_layers=2,
                mel_encoder_n_hidden=512)


class TestReferenceCodeParityFlagshipDims:
    """The dims we ship (config.json:49-66) — fp32 accumulation across
    the 1024-wide recurrences is what toy dims cannot exercise."""

    @pytest.fixture(scope="class")
    def built(self, ref):
        return _build(ref, FLAGSHIP, n_flows=2, seed=6)

    def test_forward(self, built):
        params, config, model = built
        mel, text, sids, in_lens, out_lens, _ = _forward_inputs(
            80, seed=14, B=2, T=12, Tk=10)
        out_ours = flowtron_forward(
            params, config, jnp.asarray(mel), jnp.asarray(sids),
            jnp.asarray(text), jnp.asarray(in_lens), jnp.asarray(out_lens))
        with torch.no_grad():
            out_ref = model(torch.from_numpy(mel.copy()),
                            torch.from_numpy(sids), torch.from_numpy(text),
                            torch.from_numpy(in_lens),
                            torch.from_numpy(out_lens), None)
        _compare_forward(out_ours, out_ref, out_lens, 2, atol=5e-4)

    def test_infer_mel(self, built):
        params, config, model = built
        rng = np.random.default_rng(15)
        residual = (rng.standard_normal((1, 80, 10)) * 0.5) \
            .astype(np.float32)
        text = rng.integers(1, 185, (1, 12))
        sids = np.array([1])
        with torch.no_grad():
            mel_ref, _ = model.infer(
                torch.from_numpy(residual.copy()), torch.from_numpy(sids),
                torch.from_numpy(text), gate_threshold=1e6)
        mel_ours, _, _ = flowtron_infer(
            params, config, jnp.asarray(residual), jnp.asarray(sids),
            jnp.asarray(text), gate_threshold=1e6)
        mae = np.abs(np.asarray(mel_ours) - mel_ref.numpy()).mean()
        assert mae < 1e-3, f"flagship mel MAE {mae} vs reference code"
