"""WaveGlow vocoder tests: invertibility, shapes, loss, torch bridge."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from flowtron_tpu.vocoder import (
    waveglow_init, waveglow_forward, waveglow_infer, waveglow_loss,
    import_waveglow_torch,
)

TINY = dict(n_mel_channels=8, n_flows=4, n_group=8, n_early_every=2,
            n_early_size=2, n_layers=2, n_channels=16, kernel_size=3)


@pytest.fixture(scope="module")
def tiny_wg():
    params, config = waveglow_init(jax.random.PRNGKey(0), **TINY)
    # nudge the zero-init end convs so the flow is non-trivial
    for f in range(config["n_flows"]):
        k = jax.random.fold_in(jax.random.PRNGKey(1), f)
        params["wn"][f]["end"]["w"] = 0.02 * jax.random.normal(
            k, params["wn"][f]["end"]["w"].shape)
    return params, config


class TestUpsampleTorchParity:
    def test_matches_torch_conv_transpose1d(self):
        """The phase-decomposed matmul upsample must match torch's
        ConvTranspose1d bit-for-bit-ish: the published waveglow
        checkpoints were trained with torch semantics (round-1's
        jax.lax.conv_transpose path used an UNFLIPPED kernel and
        silently diverged — this test pins the fix)."""
        import torch
        import torch.nn.functional as F
        from flowtron_tpu.vocoder.waveglow import _upsample_mel

        params, _ = waveglow_init(jax.random.PRNGKey(3), **TINY)
        rng = np.random.default_rng(0)
        B, M, C = 2, 7, TINY["n_mel_channels"]
        spect = rng.standard_normal((B, C, M)).astype(np.float32)
        w = np.asarray(params["upsample"]["w"]).copy()
        b = np.asarray(params["upsample"]["b"]).copy()

        yt = F.conv_transpose1d(torch.from_numpy(spect),
                                torch.from_numpy(w), torch.from_numpy(b),
                                stride=256).numpy()
        cutoff = M * 256
        Tg = cutoff // 8
        yt = (yt[:, :, :cutoff].reshape(B, C, Tg, 8)
              .transpose(0, 2, 1, 3).reshape(B, Tg, C * 8)
              .transpose(0, 2, 1))
        ours = np.asarray(_upsample_mel(params, jnp.asarray(spect), 8,
                                        cutoff))
        np.testing.assert_allclose(ours, yt, atol=2e-6)


class TestWavenetImpls:
    def test_tc_and_pallas_match_nch(self):
        """All three WN implementations (XLA convs, time-major matmuls,
        fused Pallas layers) agree, including tile padding paths."""
        from flowtron_tpu.vocoder.waveglow import _wavenet
        params, config = waveglow_init(jax.random.PRNGKey(5), **TINY)
        rng = np.random.default_rng(0)
        wn = params["wn"][0]
        wn["end"]["w"] = jnp.asarray(
            rng.standard_normal(wn["end"]["w"].shape).astype(np.float32))
        B, nh, T = 2, 4, 300  # not a tile multiple on purpose
        x = jnp.asarray(rng.standard_normal((B, nh, T)).astype(np.float32))
        spect = jnp.asarray(
            rng.standard_normal((B, 64, T)).astype(np.float32))
        args = (wn, x, spect, TINY["n_layers"], TINY["n_channels"])
        ref = _wavenet(*args, impl="nch")
        np.testing.assert_allclose(np.asarray(_wavenet(*args, impl="tc")),
                                   np.asarray(ref), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(_wavenet(*args, impl="pallas_interpret")),
            np.asarray(ref), atol=1e-5)


def _mel_and_audio(B=2, T_mel=6, seed=0, n_mel=8):
    rng = np.random.default_rng(seed)
    mel = rng.standard_normal((B, n_mel, T_mel)).astype(np.float32)
    audio = rng.standard_normal((B, T_mel * 256)).astype(np.float32) * 0.3
    return jnp.asarray(mel), jnp.asarray(audio)


class TestWaveGlow:
    def test_forward_shapes(self, tiny_wg):
        params, config = tiny_wg
        mel, audio = _mel_and_audio()
        z, log_s_list, log_det_list = waveglow_forward(params, config, mel,
                                                       audio)
        assert z.shape == (2, 8, 6 * 256 // 8)
        assert len(log_s_list) == 4 and len(log_det_list) == 4
        # early output after flow 2: flows 2,3 operate on 6 channels
        assert log_s_list[0].shape[1] == 4
        assert log_s_list[2].shape[1] == 3

    def test_invertibility(self, tiny_wg):
        """forward(infer(z)) round-trips through the squeeze layout."""
        params, config = tiny_wg
        mel, _ = _mel_and_audio()
        audio = waveglow_infer(params, config, mel, sigma=0.7,
                               key=jax.random.PRNGKey(3))
        assert audio.shape == (2, 6 * 256)
        z, _, _ = waveglow_forward(params, config, mel, audio)
        # z must be Gaussian-ish with std ~0.7 (it IS the sampled z)
        # exact roundtrip check: re-infer feeding the same z is impossible
        # (z is internal), so check statistics + determinism instead
        assert 0.4 < float(jnp.std(z)) < 1.0

    def test_coupling_inverse_exact(self, tiny_wg):
        """audio -> z -> audio through forward/manual-inverse is exact."""
        params, config = tiny_wg
        mel, audio = _mel_and_audio()
        z, log_s_list, _ = waveglow_forward(params, config, mel, audio)

        # manually invert: run the inference loop but substitute our z
        from flowtron_tpu.vocoder.waveglow import (
            _wavenet, _upsample_mel, _unsqueeze_audio)
        n_group = config["n_group"]
        Tg = z.shape[2]
        spect_g = _upsample_mel(params, mel, n_group, Tg * n_group)[:, :, :Tg]

        # split z into early chunks + core, mirroring forward's concat order
        chunks = []
        n_remaining = n_group
        sizes = []
        for f in range(config["n_flows"]):
            if f % config["n_early_every"] == 0 and f > 0:
                sizes.append(config["n_early_size"])
                n_remaining -= config["n_early_size"]
        sizes.append(n_remaining)
        ofs = 0
        for s in sizes:
            chunks.append(z[:, ofs:ofs + s])
            ofs += s
        audio_g = chunks.pop()  # innermost

        for f in reversed(range(config["n_flows"])):
            n_half = audio_g.shape[1] // 2
            a0, a1 = audio_g[:, :n_half], audio_g[:, n_half:]
            out = _wavenet(params["wn"][f], a0, spect_g,
                           config["n_layers"], config["n_channels"])
            log_s, b = out[:, n_half:], out[:, :n_half]
            a1 = (a1 - b) * jnp.exp(-log_s)
            audio_g = jnp.concatenate([a0, a1], axis=1)
            W_inv = jnp.linalg.inv(params["convinv"][f]["w"])
            audio_g = jnp.einsum("ij,bjt->bit", W_inv, audio_g)
            if f % config["n_early_every"] == 0 and f > 0:
                audio_g = jnp.concatenate([chunks.pop(), audio_g], axis=1)

        recon = _unsqueeze_audio(audio_g)
        np.testing.assert_allclose(np.asarray(recon), np.asarray(audio),
                                   atol=1e-4)

    def test_loss_finite_and_grad(self, tiny_wg):
        params, config = tiny_wg
        mel, audio = _mel_and_audio()

        def loss_fn(p):
            z, ls, ld = waveglow_forward(p, config, mel, audio)
            return waveglow_loss(z, ls, ld, sigma=1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(loss))
        assert all(np.isfinite(np.asarray(g)).all()
                   for g in jax.tree.leaves(grads))

    def test_torch_import(self, tiny_wg):
        """Round-trip a synthetic torch-layout state_dict (incl. weight
        norm factored convs)."""
        params, config = tiny_wg
        rng = np.random.default_rng(4)
        sd = {"upsample.weight": rng.standard_normal((8, 80, 1024)).astype(np.float32)[:, :8],
              "upsample.bias": rng.standard_normal(80).astype(np.float32)}
        # fix shapes: upsample is (in=80 -> out 80); here n_mel=8
        sd["upsample.weight"] = rng.standard_normal((8, 8, 1024)).astype(np.float32)
        sd["upsample.bias"] = rng.standard_normal(8).astype(np.float32)
        for f in range(config["n_flows"]):
            C = params["convinv"][f]["w"].shape[0]
            sd[f"convinv.{f}.conv.weight"] = \
                rng.standard_normal((C, C, 1)).astype(np.float32)
            wn = params["wn"][f]
            for ours, theirs in (("start", "start"), ("end", "end"),
                                 ("cond", "cond_layer")):
                w = np.asarray(wn[ours]["w"])
                if ours == "start":  # exercise the weight-norm path
                    v = rng.standard_normal(w.shape).astype(np.float32)
                    g = rng.uniform(0.5, 2, (w.shape[0], 1, 1)).astype(np.float32)
                    sd[f"WN.{f}.{theirs}.weight_v"] = v
                    sd[f"WN.{f}.{theirs}.weight_g"] = g
                else:
                    sd[f"WN.{f}.{theirs}.weight"] = \
                        rng.standard_normal(w.shape).astype(np.float32)
                sd[f"WN.{f}.{theirs}.bias"] = rng.standard_normal(
                    w.shape[0]).astype(np.float32)
            for l in range(config["n_layers"]):
                for key in ("in_layers", "res_skip_layers"):
                    w = np.asarray(wn[key][l]["w"])
                    sd[f"WN.{f}.{key}.{l}.weight"] = \
                        rng.standard_normal(w.shape).astype(np.float32)
                    sd[f"WN.{f}.{key}.{l}.bias"] = rng.standard_normal(
                        w.shape[0]).astype(np.float32)

        import copy
        p2 = import_waveglow_torch(copy.deepcopy(jax.tree.map(np.asarray, params)),
                                   config, sd)
        np.testing.assert_allclose(
            np.asarray(p2["convinv"][0]["w"]),
            sd["convinv.0.conv.weight"][:, :, 0])
        # weight-norm folded: w = g * v / ||v||
        v = sd["WN.0.start.weight_v"]
        g = sd["WN.0.start.weight_g"]
        expect = g * v / np.sqrt((v * v).sum(axis=(1, 2), keepdims=True))
        np.testing.assert_allclose(np.asarray(p2["wn"][0]["start"]["w"]),
                                   expect, rtol=1e-5)
