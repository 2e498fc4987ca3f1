"""Inference: text -> mel (-> wav) matching reference:inference.py:40-90.

Loads a checkpoint (native or torch-format), phonemizes text through the
Data frontend, samples z ~ N(0, sigma^2), inverts the flows, writes
mel/attention PNGs, and vocodes (WaveGlow-style vocoder when a checkpoint
is given, Griffin-Lim mel-inversion fallback otherwise).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from flowtron_tpu.models import flowtron_init, flowtron_infer
from flowtron_tpu.train.checkpoints import load_checkpoint, warmstart
from flowtron_tpu.data import Data


def load_model_for_inference(config, checkpoint_path):
    model_config = dict(config["model_config"])
    params, static_cfg = flowtron_init(jax.random.PRNGKey(0), **model_config)
    if checkpoint_path.endswith((".pt", ".pth")):
        params = warmstart(checkpoint_path, params)  # torch bridge
    else:
        params, _, _, _ = load_checkpoint(checkpoint_path, params)
    return params, static_cfg


def synthesize(params, static_cfg, text_ids, speaker_id, n_frames=400,
               sigma=0.5, gate_threshold=0.5, seed=1234, fused=False):
    """text ids (list[int]) -> (mel (80, n_valid), attns, n_valid)."""
    key = jax.random.PRNGKey(seed)
    n_mel = static_cfg["n_mel_channels"]
    residual = jax.random.normal(key, (1, n_mel, n_frames)) * sigma
    text = jnp.asarray(np.asarray(text_ids)[None])
    sid = jnp.asarray([speaker_id])
    mel, attns, n_valid = flowtron_infer(
        params, static_cfg, residual, sid, text,
        gate_threshold=gate_threshold, fused=fused)
    n = int(n_valid[0])
    return np.asarray(mel)[0, :, :n], [np.asarray(a)[0, :n] for a in attns], n


def mel_to_audio_griffinlim(mel, data_config, n_iters=30, seed=0):
    """Fallback vocoder: invert the mel filterbank (NNLS-lite: pinv +
    clamp) then Griffin-Lim phase recovery. Pure numpy — runs on host
    regardless of the accelerator (some TPU runtimes lack complex ops)."""
    from flowtron_tpu.audio.mel import mel_filterbank
    from flowtron_tpu.audio.griffin_lim import griffin_lim_numpy

    basis = mel_filterbank(
        data_config["sampling_rate"], data_config["filter_length"],
        int(np.asarray(mel).shape[0]), data_config["mel_fmin"],
        data_config["mel_fmax"])
    mag_est = np.clip(np.linalg.pinv(basis) @ np.exp(np.asarray(mel)),
                      0, None)
    audio = griffin_lim_numpy(
        mag_est, data_config["filter_length"], data_config["hop_length"],
        data_config["win_length"], n_iters=n_iters, seed=seed)
    if audio.size == 0:  # <= 1 mel frame inverts to zero samples
        audio = np.zeros(data_config["hop_length"], np.float32)
    return audio


def _run_streaming(config, args, params, static_cfg, text_ids, speaker_id,
                   data_config):
    """--stream: write the wav incrementally as synthesis runs (any
    n_flows + neural vocoder; multi-flow models run the gated prelude
    offline first — see infer/streaming.py)."""
    if not args.waveglow_path:
        raise SystemExit("--stream requires a vocoder checkpoint (-w)")
    from flowtron_tpu.vocoder import load_waveglow
    from flowtron_tpu.infer.streaming import stream_tts

    wg_params, wg_cfg = load_waveglow(args.waveglow_path)
    sd = None
    if getattr(args, "denoise", 0.0) > 0:
        from flowtron_tpu.vocoder.denoiser import (Denoiser,
                                                   StreamingDenoiser)
        den = Denoiser(
            wg_params, wg_cfg,
            filter_length=data_config["filter_length"],
            hop_length=data_config["hop_length"],
            win_length=data_config["win_length"],
            n_mel_channels=config["model_config"]["n_mel_channels"])
        sd = StreamingDenoiser(den, strength=args.denoise)
    os.makedirs(args.output_dir, exist_ok=True)
    base = os.path.join(
        args.output_dir,
        f"sid{args.id}_sigma{args.sigma}_seed{args.seed}_stream")
    import time
    import wave
    t0 = time.perf_counter()
    n = 0
    with wave.open(base + ".wav", "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(data_config["sampling_rate"])

        def write(samples):
            nonlocal n
            if samples.size == 0:
                return
            pcm = (np.clip(samples, -1, 1) * 32767).astype(np.int16)
            w.writeframes(pcm.tobytes())
            n += len(pcm)
            print(f"  +{len(pcm)/data_config['sampling_rate']:.2f}s audio "
                  f"at t={time.perf_counter()-t0:.2f}s", flush=True)

        for chunk in stream_tts(
                params, static_cfg, wg_params, wg_cfg,
                jax.random.PRNGKey(args.seed), jnp.asarray([speaker_id]),
                jnp.asarray(np.asarray(text_ids)[None]), sigma=args.sigma,
                gate_threshold=args.gate, max_frames=args.n_frames):
            out = np.asarray(chunk[0])
            write(sd.feed(out) if sd is not None else out)
        if sd is not None:
            write(sd.flush())
    print(f"wrote {base}.wav ({n/data_config['sampling_rate']:.2f}s)")
    return base


def run_inference(config, args):
    """CLI entry (reference:inference.py:93-132 contract)."""
    data_config = dict(config["data_config"])
    params, static_cfg = load_model_for_inference(config, args.flowtron_path)
    qmode = getattr(args, "quantize", "") or (
        "w8" if getattr(args, "int8", False) else "")
    if qmode:
        from flowtron_tpu.infer.quantize import quantize_flows_for_inference
        params = quantize_flows_for_inference(params, mode=qmode)

    from flowtron_tpu.data.dataset import data_kwargs
    dataset = Data(data_config["training_files"], **data_kwargs(data_config))
    text_ids = dataset.get_text(args.text)
    speaker_id = dataset.get_speaker_id(args.id)

    if getattr(args, "stream", False):
        return _run_streaming(config, args, params, static_cfg, text_ids,
                              int(speaker_id), data_config)

    mel, attns, n_valid = synthesize(
        params, static_cfg, text_ids, int(speaker_id),
        n_frames=args.n_frames, sigma=args.sigma,
        gate_threshold=args.gate, seed=args.seed,
        fused="early" if getattr(args, "fused", False) else False)
    print(f"synthesized {n_valid} mel frames "
          f"({n_valid * data_config['hop_length'] / data_config['sampling_rate']:.2f}s)")

    os.makedirs(args.output_dir, exist_ok=True)
    base = os.path.join(
        args.output_dir,
        f"sid{args.id}_sigma{args.sigma}_seed{args.seed}")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, axes = plt.subplots(1 + len(attns), 1, figsize=(8, 3 * (1 + len(attns))))
    axes = np.atleast_1d(axes)
    axes[0].imshow(mel, aspect="auto", origin="lower", interpolation="none")
    axes[0].set_title("mel")
    for i, a in enumerate(attns):
        axes[1 + i].imshow(a.T, aspect="auto", origin="lower",
                           interpolation="none")
        axes[1 + i].set_title(f"attention flow {i}")
    fig.tight_layout()
    fig.savefig(base + ".png")
    plt.close(fig)

    if args.waveglow_path:
        from flowtron_tpu.vocoder import load_waveglow, waveglow_infer
        wg_params, wg_cfg = load_waveglow(args.waveglow_path)
        audio = waveglow_infer(wg_params, wg_cfg, jnp.asarray(mel[None]),
                               sigma=0.8)
        if getattr(args, "denoise", 0.0) > 0:
            from flowtron_tpu.vocoder.denoiser import Denoiser
            den = Denoiser(wg_params, wg_cfg,
                           n_mel_channels=wg_cfg["n_mel_channels"])
            audio = den(audio, strength=args.denoise)
        audio = np.asarray(audio)[0]
    else:
        print("no vocoder checkpoint; using Griffin-Lim fallback")
        audio = mel_to_audio_griffinlim(mel, data_config)

    if audio.size == 0:
        # a 1-frame mel (gate fired immediately) inverts to zero samples;
        # still write a valid (silent) wav rather than crash
        audio = np.zeros(data_config["hop_length"], np.float32)
    audio = audio / max(1e-8, np.abs(audio).max())
    from scipy.io import wavfile
    wavfile.write(base + ".wav", data_config["sampling_rate"],
                  (audio * 32767).astype(np.int16))
    print("wrote", base + ".wav")
    return base
