"""Style transfer via Gaussian posterior over reference utterances.

Replicates the reference notebook's procedure
(inference_style_transfer.ipynb cells 10-18): push reference mels forward
through the flows to get z, tile each utterance's (valid) z frames to the
target length, average, and form the ridge-regularized posterior mean
``mu = (n/lam) * z_bar / (n/lam + 1)`` (prior N(0, I), lam = 1e-4).
Sampling Normal(mu, sigma) and inverting the flows transfers the reference
style onto new text.
"""

import numpy as np
import jax
import jax.numpy as jnp

from flowtron_tpu.models import flowtron_forward, flowtron_infer


def collect_z(params, config, mel, speaker_ids, text, in_lens, out_lens,
              attn_prior=None):
    """Forward one (batched) utterance set; returns z (T, B, n_mel)."""
    out = flowtron_forward(params, config, mel, speaker_ids, text,
                           in_lens, out_lens, attn_prior=attn_prior)
    return out[0]


def posterior_mean(z_list, out_lens_list, n_frames, lam=1e-4):
    """z_list: per-utterance (T_i, 80) valid-frame latents (numpy/jnp).

    Tiles each to n_frames, averages across utterances, applies the ridge
    posterior. Returns (80, n_frames).
    """
    tiled = []
    for z in z_list:
        z = np.asarray(z)  # (T, 80)
        reps = int(np.ceil(n_frames / z.shape[0]))
        tiled.append(np.tile(z, (reps, 1))[:n_frames])
    z_bar = np.mean(tiled, axis=0).T  # (80, n_frames)
    n = len(z_list)
    ratio = n / lam
    return (ratio * z_bar / (ratio + 1)).astype(np.float32)


def style_transfer(params, config, reference_batch, text_ids, speaker_id,
                   n_frames=400, sigma=0.5, gate_threshold=0.5, seed=1234,
                   lam=1e-4):
    """End-to-end style transfer.

    reference_batch: dict with mel/speaker_ids/text/in_lens/out_lens of the
    style reference utterances (padded batch). text_ids: target text.
    """
    z = collect_z(params, config,
                  jnp.asarray(reference_batch["mel"]),
                  jnp.asarray(reference_batch["speaker_ids"]),
                  jnp.asarray(reference_batch["text"]),
                  jnp.asarray(reference_batch["in_lens"]),
                  jnp.asarray(reference_batch["out_lens"]),
                  attn_prior=None)
    z = np.asarray(z)  # (T, B, 80)
    z_list = [z[:int(L), b] for b, L in
              enumerate(np.asarray(reference_batch["out_lens"]))]
    mu = posterior_mean(z_list, np.asarray(reference_batch["out_lens"]),
                        n_frames, lam)

    key = jax.random.PRNGKey(seed)
    residual = jnp.asarray(mu)[None] + sigma * jax.random.normal(
        key, (1, mu.shape[0], n_frames))
    text = jnp.asarray(np.asarray(text_ids)[None])
    sid = jnp.asarray([speaker_id])
    mel, attns, n_valid = flowtron_infer(
        params, config, residual, sid, text, gate_threshold=gate_threshold)
    n = int(n_valid[0])
    return np.asarray(mel)[0, :, :n], n
