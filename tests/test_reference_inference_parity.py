"""Entry-path parity against the reference's ACTUAL inference.py.

The reference's one-shot synthesis CLI (reference:inference.py:40-90)
could never run in-container: it imports the empty tacotron2/waveglow
submodule (`from glow import WaveGlow`, reference:inference.py:34-36)
and hard-codes CUDA. Both are removable at the seams: a `glow` module
shim plus a pickled stub vocoder whose infer() is a pure deterministic
mel fingerprint stands in for the missing submodule, and the same CPU
aliases the flowtron-execution tests use remove the CUDA coupling
(torch.cuda.FloatTensor, Tensor/Module .cuda()). 2020-era matplotlib
accepted origin='bottom'; an imshow wrapper maps it to 'lower'.

What executes is the reference's OWN entry path — torch seeding, the
Data-driven text/speaker setup, the z draw, model.infer, the PNG dumps,
waveglow.infer(mels.half(), sigma=0.8), peak normalization, and the
wav write — and what is pinned is that our inference stack reproduces
its semantics bit-for-bit given the same inputs: the frontend ids, the
dense speaker lookup, the mel content, the stop length, and the final
audio file.
"""

import importlib.util
import json
import os
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from flowtron_tpu.models import flowtron_init, flowtron_infer
from flowtron_tpu.train.checkpoints import export_torch_state_dict

from tests.test_reference_data_parity import _fake_librosa, _fake_text

REF_ROOT = "/root/reference"
REF_INFER = os.path.join(REF_ROOT, "inference.py")
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.exists(REF_INFER),
    reason="reference checkout not available")]

# the data pipeline (and the reference's hard-coded residual shape,
# reference:inference.py:69) is fixed at 80 mel channels; everything
# else tiny
SMALL80 = dict(n_speakers=3, n_speaker_dim=8, n_text=185, n_text_dim=16,
               n_mel_channels=80, n_hidden=16, n_attn_channels=8,
               n_lstm_layers=2, mel_encoder_n_hidden=8)
MODEL_DEFAULTS = dict(use_gate_layer=True, n_components=0,
                      fixed_gaussian=True, mean_scale=0.0,
                      dummy_speaker_embedding=False,
                      use_cumm_attention=False)

_STUB_UPSAMPLE = 8


class StubWaveGlow:
    """Pickled stand-in for the empty waveglow submodule: infer() is a
    pure function of the mel (sigma-scaled per-frame fp16 mean,
    upsampled), so final-audio equality proves the mel content and the
    call semantics (mels.half(), sigma=0.8, peak normalize) survived
    the reference's whole entry path."""

    convinv = ()

    def cuda(self, *a, **k):
        return self

    def half(self):
        return self

    def float(self):
        return self

    def eval(self):
        return self

    def infer(self, mels, sigma=1.0):
        m = mels.float().mean(dim=1)            # (B, T)
        return (sigma * m).repeat_interleave(_STUB_UPSAMPLE, dim=1)


def stub_vocode_numpy(mel, sigma=0.8):
    """StubWaveGlow.infer mirrored in numpy incl. the .half() rounding
    the reference applies before the call (inference.py:82)."""
    m16 = np.asarray(mel, np.float32).astype(np.float16).astype(np.float32)
    m = m16.mean(axis=1)                        # (B, T)
    return np.repeat(sigma * m, _STUB_UPSAMPLE, axis=1)


@pytest.fixture(scope="module")
def ref_inference():
    """The reference's inference.py, executed whole under the shims."""
    inject = {}
    inject.update(_fake_librosa())
    inject.update(_fake_text())
    glow = types.ModuleType("glow")
    glow.WaveGlow = StubWaveGlow
    inject["glow"] = glow
    extra = ["flowtron", "data", "train", "audio_processing",
             "reference_inference"]
    saved = {k: sys.modules.get(k) for k in list(inject) + extra}
    sys.modules.update(inject)

    torch.cuda.LongTensor = torch.LongTensor
    torch.cuda.FloatTensor = torch.FloatTensor
    t_cuda, m_cuda = torch.Tensor.cuda, torch.nn.Module.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    import matplotlib.axes
    orig_imshow = matplotlib.axes.Axes.imshow

    def imshow(self, *a, **kw):
        if kw.get("origin") == "bottom":   # removed in modern mpl
            kw["origin"] = "lower"
        return orig_imshow(self, *a, **kw)

    matplotlib.axes.Axes.imshow = imshow
    sys.path.insert(0, REF_ROOT)
    try:
        spec = importlib.util.spec_from_file_location(
            "reference_inference", REF_INFER)
        mod = importlib.util.module_from_spec(spec)
        sys.modules["reference_inference"] = mod
        spec.loader.exec_module(mod)
        yield mod
    finally:
        sys.path.remove(REF_ROOT)
        torch.Tensor.cuda, torch.nn.Module.cuda = t_cuda, m_cuda
        matplotlib.axes.Axes.imshow = orig_imshow
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


@pytest.fixture(scope="module")
def setup(ref_inference, tmp_path_factory):
    """Tiny corpus + our checkpoint exported to the reference format +
    the stub vocoder pickle + the config globals inference.py's infer()
    reads."""
    from scipy.io import wavfile
    root = tmp_path_factory.mktemp("ref_inference")
    rng = np.random.default_rng(0)
    # non-dense speaker ids: the lookup table must map them densely
    lines = []
    for i, sid in enumerate((0, 5, 7)):
        wav = (rng.standard_normal(4096) * 2000).astype(np.int16)
        wavfile.write(root / f"u{i}.wav", 22050, wav)
        lines.append(f"{root}/u{i}.wav|dummy text {i}|{sid}")
    filelist = root / "fl.txt"
    filelist.write_text("\n".join(lines) + "\n")

    params, static_cfg = flowtron_init(
        jax.random.PRNGKey(0), n_flows=2, **SMALL80, **MODEL_DEFAULTS)
    for i, f in enumerate(params["flows"]):   # non-identity couplings
        k = jax.random.fold_in(jax.random.PRNGKey(1), i)
        f["conv"]["w"] = 0.05 * jax.random.normal(k, f["conv"]["w"].shape)
        f["conv"]["b"] = 0.01 * jax.random.normal(
            jax.random.fold_in(k, 1), f["conv"]["b"].shape)
    sd = {k: torch.from_numpy(np.array(v))
          for k, v in export_torch_state_dict(params).items()}
    ckpt = root / "flowtron.pt"
    torch.save({"state_dict": sd}, ckpt)
    wg = root / "waveglow.pt"
    torch.save({"model": StubWaveGlow()}, wg)
    # the reference's bare torch.load (inference.py:46) predates the
    # weights_only=True default; allowlist the stub so it unpickles
    torch.serialization.add_safe_globals([StubWaveGlow])

    # the reference's own shipped data_config, pointed at the corpus
    # (inference.py builds Data straight from it, inference.py:59-62)
    data_config = json.load(
        open(os.path.join(REF_ROOT, "config.json")))["data_config"]
    data_config.update({
        "training_files": str(filelist),
        "validation_files": str(filelist),
        "cmudict_path": os.path.join(REPO_ROOT, "data",
                                     "cmudict_dictionary"),
        "p_arpabet": 0.0,
        "use_attn_prior": False,
    })
    ref_inference.data_config = data_config
    ref_inference.model_config = dict(SMALL80, n_flows=2,
                                      **MODEL_DEFAULTS)
    return {"mod": ref_inference, "root": root, "ckpt": str(ckpt),
            "wg": str(wg), "params": params, "static_cfg": static_cfg,
            "data_config": data_config}


class TestReferenceInferenceEntryPath:
    TEXT = "hello there general"
    SEED = 1234
    N_FRAMES = 12
    SIGMA = 0.5

    def _run_ref(self, setup, out_name, speaker_id=5, gate=1e6):
        mod = setup["mod"]
        outdir = setup["root"] / out_name
        os.makedirs(outdir, exist_ok=True)
        mod.infer(setup["ckpt"], setup["wg"], str(outdir), self.TEXT,
                  speaker_id, self.N_FRAMES, self.SIGMA, gate, self.SEED)
        return outdir

    def _replay_residual(self, setup):
        """The reference draws z from torch's global generator AFTER
        seeding and AFTER Flowtron.__init__'s xavier draws
        (inference.py:41-54,69); replay the identical consumption."""
        mod = setup["mod"]
        torch.manual_seed(self.SEED)
        torch.cuda.manual_seed(self.SEED)
        _ = mod.Flowtron(**mod.model_config)
        return (torch.FloatTensor(1, 80, self.N_FRAMES).normal_()
                * self.SIGMA).numpy()

    def test_frontend_and_speaker_lookup_match(self, setup):
        """The reference's Data-driven text/speaker setup
        (inference.py:59-66) equals ours on the same filelist."""
        from flowtron_tpu.data import Data
        from flowtron_tpu.data.dataset import data_kwargs
        mod, dc = setup["mod"], setup["data_config"]
        ignore = ["training_files", "validation_files"]
        ref_set = mod.Data(dc["training_files"],
                           **{k: v for k, v in dc.items()
                              if k not in ignore})
        ours = Data(dc["training_files"], **data_kwargs(dc))
        assert ours.speaker_ids == ref_set.speaker_ids
        for sid in (0, 5, 7):
            assert (int(ours.get_speaker_id(sid))
                    == int(ref_set.get_speaker_id(sid)[0]))
        for text in (self.TEXT, "the 2nd test, at 10:30am!"):
            np.testing.assert_array_equal(
                ours.get_text(text), ref_set.get_text(text).numpy())

    def test_end_to_end_wav_matches(self, setup):
        """Execute the reference's infer() whole; our stack reproduces
        the written wav bit-close (same z, same frontend ids, same
        stub-vocoder arithmetic, same peak normalization)."""
        from scipy.io import wavfile
        from flowtron_tpu.data import Data
        from flowtron_tpu.data.dataset import data_kwargs

        outdir = self._run_ref(setup, "full", speaker_id=5)
        wav_path = outdir / f"sid5_sigma{self.SIGMA}.wav"
        assert wav_path.exists()
        sr, audio_ref = wavfile.read(wav_path)
        assert sr == setup["data_config"]["sampling_rate"]
        # attention PNGs, one per flow (inference.py:73-79)
        for k in range(2):
            assert (outdir
                    / f"sid5_sigma{self.SIGMA}_attnlayer{k}.png").exists()

        residual = self._replay_residual(setup)
        dc = setup["data_config"]
        ours = Data(dc["training_files"], **data_kwargs(dc))
        ids = ours.get_text(self.TEXT)
        sid = int(ours.get_speaker_id(5))
        mel, _, n_valid = flowtron_infer(
            setup["params"], setup["static_cfg"], jnp.asarray(residual),
            jnp.asarray([sid]), jnp.asarray(np.asarray(ids)[None]),
            gate_threshold=1e6)
        n = int(n_valid[0])
        assert n == self.N_FRAMES      # gate 1e6: the full latent runs
        audio = stub_vocode_numpy(np.asarray(mel)[:, :, :n], sigma=0.8)[0]
        audio = audio / np.abs(audio).max()
        assert audio_ref.shape == audio.shape
        np.testing.assert_allclose(audio, audio_ref, atol=2e-4)

    def test_gated_stop_length_matches(self, setup):
        """With a reachable gate threshold the reference writes
        stop-length audio (its frame loop breaks the step after the
        sigmoid crosses, flowtron.py:821-825); our n_valid and audio
        length agree through the same entry path."""
        from scipy.io import wavfile
        from flowtron_tpu.data import Data
        from flowtron_tpu.data.dataset import data_kwargs

        gate = 0.62
        outdir = self._run_ref(setup, "gated", speaker_id=7, gate=gate)
        sr, audio_ref = wavfile.read(
            outdir / f"sid7_sigma{self.SIGMA}.wav")
        n_ref = audio_ref.shape[0] // _STUB_UPSAMPLE
        assert 1 <= n_ref <= self.N_FRAMES

        residual = self._replay_residual(setup)
        dc = setup["data_config"]
        ours = Data(dc["training_files"], **data_kwargs(dc))
        ids = ours.get_text(self.TEXT)
        sid = int(ours.get_speaker_id(7))
        _, _, n_valid = flowtron_infer(
            setup["params"], setup["static_cfg"], jnp.asarray(residual),
            jnp.asarray([sid]), jnp.asarray(np.asarray(ids)[None]),
            gate_threshold=gate)
        assert int(n_valid[0]) == n_ref
