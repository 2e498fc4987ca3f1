"""Streaming synthesis: chunked output must match the offline pass.

- mel stage: chunked scan with carried state is exact vs the full scan
- vocoder stage: sliding-window emission with position-keyed latents is
  window-invariant; deviation vs the offline full pass is bounded and
  shrinks as context/lookahead grow
- stream_tts: end-to-end generator respects gate termination
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp

from flowtron_tpu.models import flowtron_init, flowtron_infer
from flowtron_tpu.models.ar_step import ar_step_infer
from flowtron_tpu.infer.streaming import (
    StreamingMelSynthesizer, StreamingVocoder, stream_tts, positional_z,
)
from flowtron_tpu.vocoder import (
    waveglow_init, waveglow_infer_z,
)

SMALL = dict(n_speakers=2, n_speaker_dim=4, n_text=185, n_text_dim=12,
             n_mel_channels=8, n_hidden=16, n_attn_channels=8,
             n_lstm_layers=2, mel_encoder_n_hidden=8)


@pytest.fixture(scope="module")
def model1():
    params, config = flowtron_init(jax.random.PRNGKey(0), n_flows=1,
                                   use_gate_layer=True, **SMALL)
    # give the zero-init coupling some signal
    f = params["flows"][0]
    f["conv"]["w"] = 0.05 * jax.random.normal(jax.random.PRNGKey(1),
                                              f["conv"]["w"].shape)
    return params, config


@pytest.fixture(scope="module")
def wg_small():
    return waveglow_init(jax.random.PRNGKey(2), n_mel_channels=8,
                         n_flows=4, n_group=8, n_early_every=2,
                         n_early_size=2, n_layers=3, n_channels=16)


class TestMelStreaming:
    def test_chunked_matches_offline(self, model1):
        params, config = model1
        rng = np.random.default_rng(0)
        B, N = 2, 50
        residual = jnp.asarray(
            (rng.standard_normal((B, 8, N)) * 0.6).astype(np.float32))
        text = jnp.asarray(rng.integers(1, 185, (B, 7)))
        sids = jnp.asarray([0, 1])

        mel_full, _, nv_full = flowtron_infer(
            params, config, residual, sids, text, gate_threshold=0.35)

        s = StreamingMelSynthesizer(params, config, chunk_frames=16,
                                    gate_threshold=0.35)
        chunks = list(s.stream(jax.random.PRNGKey(0), sids, text,
                               residual=residual))
        streamed = np.concatenate([np.asarray(c) for c in chunks], axis=2)

        np.testing.assert_array_equal(np.asarray(nv_full), s.n_valid)
        n = streamed.shape[2]
        for b in range(B):
            nb = min(int(s.n_valid[b]), n)
            np.testing.assert_allclose(
                streamed[b, :, :nb], np.asarray(mel_full)[b, :, :nb],
                atol=1e-5)

    def test_gate_stops_stream(self, model1):
        params, config = model1
        # bias the gate hard positive: should stop after the first chunk
        p = jax.tree.map(lambda x: x, params)
        p["flows"][0]["gate_layer"]["b"] = jnp.asarray([5.0])
        s = StreamingMelSynthesizer(p, config, chunk_frames=8,
                                    max_frames=400)
        text = jnp.asarray(np.random.default_rng(1).integers(1, 185, (1, 5)))
        chunks = list(s.stream(jax.random.PRNGKey(3),
                               jnp.zeros((1,), jnp.int32), text))
        assert len(chunks) == 1
        assert s.n_valid[0] == 1

    def test_per_stream_silence_past_gate(self, model1):
        """B=2 with one stream gating early: its yielded frames past its
        OWN n_valid are silence (never the scan's continuation), while
        the other stream matches offline to its own n_valid."""
        from flowtron_tpu.infer.streaming import SILENCE
        params, config = model1
        rng = np.random.default_rng(7)
        B, N = 2, 48
        residual = jnp.asarray(
            (rng.standard_normal((B, 8, N)) * 0.6).astype(np.float32))
        text = jnp.asarray(rng.integers(1, 185, (B, 7)))
        sids = jnp.asarray([0, 1])

        s = StreamingMelSynthesizer(params, config, chunk_frames=8,
                                    gate_threshold=0.35)
        chunks = [np.asarray(c) for c in
                  s.stream(jax.random.PRNGKey(0), sids, text,
                           residual=residual)]
        streamed = np.concatenate(chunks, axis=2)
        nv = s.n_valid
        if nv.min() == nv.max():
            pytest.skip("both streams gated at the same frame")
        b_early = int(nv.argmin())
        past = streamed[b_early, :, int(nv[b_early]):]
        if past.size:
            np.testing.assert_allclose(past, SILENCE, atol=1e-6)

    def test_two_flow_chunked_matches_offline(self):
        """The flagship 2-flow topology streams: offline gated prelude
        (flows n-1..1), then the forward flow 0 chunk-exact."""
        params, config = flowtron_init(jax.random.PRNGKey(5), n_flows=2,
                                       use_gate_layer=True, **SMALL)
        for f in params["flows"]:
            f["conv"]["w"] = 0.05 * jax.random.normal(
                jax.random.PRNGKey(6), f["conv"]["w"].shape)
        rng = np.random.default_rng(8)
        B, N = 2, 40
        residual = jnp.asarray(
            (rng.standard_normal((B, 8, N)) * 0.6).astype(np.float32))
        text = jnp.asarray(rng.integers(1, 185, (B, 6)))
        sids = jnp.asarray([0, 1])

        mel_full, _, nv_full = flowtron_infer(
            params, config, residual, sids, text, gate_threshold=0.35)

        s = StreamingMelSynthesizer(params, config, chunk_frames=16,
                                    gate_threshold=0.35, max_frames=N)
        chunks = list(s.stream(jax.random.PRNGKey(0), sids, text,
                               residual=residual))
        streamed = np.concatenate([np.asarray(c) for c in chunks], axis=2)

        np.testing.assert_array_equal(np.asarray(nv_full), s.n_valid)
        for b in range(B):
            nb = min(int(s.n_valid[b]), streamed.shape[2])
            np.testing.assert_allclose(
                streamed[b, :, :nb], np.asarray(mel_full)[b, :, :nb],
                atol=1e-5)

    def test_two_flow_fused_prelude_matches_scan(self):
        """fused=True routes the offline prelude through the Pallas
        kernel (interpret mode off-TPU); emitted mel must match the
        scan-prelude stream."""
        params, config = flowtron_init(jax.random.PRNGKey(5), n_flows=2,
                                       use_gate_layer=True, **SMALL)
        for f in params["flows"]:
            f["conv"]["w"] = 0.05 * jax.random.normal(
                jax.random.PRNGKey(6), f["conv"]["w"].shape)
        rng = np.random.default_rng(10)
        B, N = 1, 32
        residual = jnp.asarray(
            (rng.standard_normal((B, 8, N)) * 0.6).astype(np.float32))
        text = jnp.asarray(rng.integers(1, 185, (B, 6)))
        sids = jnp.zeros((B,), jnp.int32)

        def run(fused):
            s = StreamingMelSynthesizer(params, config, chunk_frames=16,
                                        gate_threshold=0.35,
                                        max_frames=N, fused=fused)
            out = np.concatenate(
                [np.asarray(c) for c in s.stream(
                    jax.random.PRNGKey(0), sids, text,
                    residual=residual)], axis=2)
            return out, s.n_valid.copy()

        scan_mel, scan_nv = run(False)
        fused_mel, fused_nv = run(True)
        np.testing.assert_array_equal(scan_nv, fused_nv)
        np.testing.assert_allclose(fused_mel, scan_mel, atol=1e-4)

    def test_temperature_and_max_frames_per_call(self, model1):
        """Per-call temperature is a traced scalar (no recompile per
        value) and max_frames caps the emitted length."""
        params, config = model1
        rng = np.random.default_rng(9)
        text = jnp.asarray(rng.integers(1, 185, (1, 6)))
        sids = jnp.zeros((1,), jnp.int32)
        s = StreamingMelSynthesizer(params, config, chunk_frames=8,
                                    gate_threshold=1e6, max_frames=32)
        a = np.concatenate([np.asarray(c) for c in s.stream(
            jax.random.PRNGKey(1), sids, text, temperature=1.0)], axis=2)
        b = np.concatenate([np.asarray(c) for c in s.stream(
            jax.random.PRNGKey(1), sids, text, temperature=3.0)], axis=2)
        assert not np.allclose(a, b)
        capped = np.concatenate([np.asarray(c) for c in s.stream(
            jax.random.PRNGKey(1), sids, text, max_frames=9)], axis=2)
        assert capped.shape[2] <= 16  # ceil(9/8) chunks
        assert s.n_valid[0] == 9

    def test_carry_roundtrip_exact(self, model1):
        """ar_step_infer carry API: split scan == one scan, bitwise."""
        params, config = model1
        flow = params["flows"][0]
        rng = np.random.default_rng(2)
        N, B = 24, 1
        z = jnp.asarray((rng.standard_normal((N, B, 8)) * 0.5)
                        .astype(np.float32))
        enc = jnp.asarray((rng.standard_normal((5, B, 12 + 4)) * 0.3)
                          .astype(np.float32))
        mel_a, _, g_a, carry = ar_step_infer(flow, z[:12], enc,
                                             return_carry=True)
        mel_b, _, g_b, _ = ar_step_infer(flow, z[12:], enc, carry=carry,
                                         return_carry=True)
        mel_full, _, g_full, _ = ar_step_infer(flow, z, enc,
                                               return_carry=True)
        np.testing.assert_array_equal(
            np.concatenate([np.asarray(mel_a), np.asarray(mel_b)]),
            np.asarray(mel_full))
        np.testing.assert_array_equal(
            np.concatenate([np.asarray(g_a), np.asarray(g_b)]),
            np.asarray(g_full))


class TestVocoderStreaming:
    def _offline(self, wg, mel, key, sigma):
        params, cfg = wg
        Tg = mel.shape[2] * 256 // cfg["n_group"]
        z_main, z_early = positional_z(key, cfg, mel.shape[0], 0, Tg, sigma)
        return np.asarray(waveglow_infer_z(params, cfg, mel, z_main,
                                           z_early))

    def test_streamed_matches_offline(self, wg_small):
        params, cfg = wg_small
        rng = np.random.default_rng(3)
        B, F = 1, 120
        mel = jnp.asarray((rng.standard_normal((B, 8, F)) * 0.5 - 4.0)
                          .astype(np.float32))
        key = jax.random.PRNGKey(7)
        ref = self._offline(wg_small, mel, key, 0.8)

        voc = StreamingVocoder(params, cfg, key, sigma=0.8,
                               context=24, lookahead=16)
        outs = []
        for s in range(0, F, 30):
            outs.append(voc.push(mel[:, :, s:s + 30]))
        outs.append(voc.flush())
        streamed = np.concatenate(outs, axis=1)

        assert streamed.shape == ref.shape
        scale = np.abs(ref).max() + 1e-9
        dev = np.abs(streamed - ref).max() / scale
        # truncated receptive field: small, bounded seam deviation
        assert dev < 5e-3, dev

    def test_more_context_tightens(self, wg_small):
        params, cfg = wg_small
        rng = np.random.default_rng(4)
        mel = jnp.asarray((rng.standard_normal((1, 8, 90)) * 0.5 - 4.0)
                          .astype(np.float32))
        key = jax.random.PRNGKey(8)
        ref = self._offline(wg_small, mel, key, 0.8)
        devs = []
        for ctx in (4, 32):
            voc = StreamingVocoder(params, cfg, key, sigma=0.8,
                                   context=ctx, lookahead=ctx)
            outs = [voc.push(mel[:, :, s:s + 30]) for s in range(0, 90, 30)]
            outs.append(voc.flush())
            streamed = np.concatenate(outs, axis=1)
            devs.append(np.abs(streamed - ref).max())
        assert devs[1] <= devs[0]

    def test_window_invariance(self, wg_small):
        """Same stream content regardless of push granularity."""
        params, cfg = wg_small
        rng = np.random.default_rng(5)
        mel = jnp.asarray((rng.standard_normal((1, 8, 60)) * 0.5 - 4.0)
                          .astype(np.float32))
        key = jax.random.PRNGKey(9)

        def run(step):
            voc = StreamingVocoder(params, cfg, key, sigma=0.8,
                                   context=16, lookahead=8)
            outs = [voc.push(mel[:, :, s:s + step])
                    for s in range(0, 60, step)]
            outs.append(voc.flush())
            return np.concatenate(outs, axis=1)

        a, b = run(20), run(30)
        scale = np.abs(a).max() + 1e-9
        assert np.abs(a - b).max() / scale < 5e-3


class TestStreamTTS:
    def test_end_to_end_generator(self, model1, wg_small):
        params, config = model1
        wgp, wgc = wg_small
        text = jnp.asarray(np.random.default_rng(6).integers(1, 185, (1, 6)))
        chunks = list(stream_tts(
            params, config, wgp, wgc, jax.random.PRNGKey(11),
            jnp.zeros((1,), jnp.int32), text, chunk_frames=16,
            gate_threshold=0.35, max_frames=64, context=8, lookahead=8))
        assert chunks, "no audio produced"
        wav = np.concatenate(chunks, axis=1)
        assert wav.shape[0] == 1
        assert wav.shape[1] % 256 == 0
        assert np.isfinite(wav).all()
        assert wav.shape[1] >= 256  # at least one frame of audio

    def test_cli_stream_denoise(self, model1, wg_small, tmp_path):
        """--stream -d: the CLI wires a StreamingDenoiser around the
        chunk generator; sample count is preserved, audio changes."""
        import pickle
        import wave
        from types import SimpleNamespace
        from flowtron_tpu.infer.sampling import _run_streaming

        params, static_cfg = model1
        wgp, wgc = wg_small
        # non-zero coupling end convs: with the zero-init default the
        # sigma=0 bias audio is identically zero and denoise is a no-op
        wgp = jax.tree_util.tree_map(lambda x: x, wgp)
        for wn in wgp["wn"]:
            wn["end"] = dict(wn["end"])
            wn["end"]["w"] = 0.05 * jax.random.normal(
                jax.random.PRNGKey(7), wn["end"]["w"].shape)
        wg_path = tmp_path / "wg.pkl"
        with open(wg_path, "wb") as f:
            pickle.dump({"params": wgp, "config": wgc}, f)
        data_config = {"sampling_rate": 22050, "filter_length": 1024,
                       "hop_length": 256, "win_length": 1024}
        config = {"model_config": {"n_mel_channels": 8}}

        def run(denoise, sub):
            args = SimpleNamespace(
                waveglow_path=str(wg_path),
                output_dir=str(tmp_path / sub), id=0, sigma=0.5,
                seed=3, gate=0.35, n_frames=32, denoise=denoise)
            base = _run_streaming(config, args, params, static_cfg,
                                  [1, 5, 9], 0, data_config)
            with wave.open(base + ".wav") as w:
                return w.readframes(w.getnframes()), w.getnframes()

        raw, n0 = run(0.0, "a")
        dn, n1 = run(0.2, "b")
        assert n0 == n1 and n0 > 0
        assert raw != dn  # subtraction applied
