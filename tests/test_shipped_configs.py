"""Every shipped config must be constructible against the vendored
assets: model init from its model_config, and a working Data frontend
for each filelist that ships in-tree (the libritts2k corpus filelist is
not distributed by the reference either — model init still must work)."""

import json
import os

import numpy as np
import pytest
import jax

from flowtron_tpu.config import load_config
from flowtron_tpu.data.dataset import Data
from flowtron_tpu.models import flowtron_init

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FLOWTRON_CONFIGS = [
    "config.json",
    "configs/config_ljs_1flow.json",
    "configs/config_libritts.json",
    "configs/config_libritts2k_gm.json",
]


def _tiny_dims(mc):
    """Shrink width-only hyperparameters so CPU init stays fast; counts
    that shape the architecture (flows, speakers, components) are kept."""
    mc = dict(mc)
    mc.update(n_text_dim=16, n_speaker_dim=8, n_hidden=16,
              n_attn_channels=8, mel_encoder_n_hidden=8)
    return mc


@pytest.mark.parametrize("rel", FLOWTRON_CONFIGS)
def test_model_constructs(rel):
    cfg = load_config(os.path.join(REPO, rel))
    params, static_cfg = flowtron_init(jax.random.PRNGKey(0),
                                       **_tiny_dims(cfg["model_config"]))
    assert static_cfg["n_flows"] == cfg["model_config"]["n_flows"]
    gm = cfg["model_config"]["n_components"] > 0
    assert ("gaussian_mixture" in params) == gm
    assert ("mel_encoder" in params) == gm


@pytest.mark.parametrize("rel", FLOWTRON_CONFIGS)
def test_data_frontend_from_config(rel):
    cfg = load_config(os.path.join(REPO, rel))
    dc = dict(cfg["data_config"])
    val = os.path.join(REPO, dc["validation_files"])
    if not os.path.exists(val):
        pytest.skip(f"corpus filelist not distributed: {rel}")
    for key in ("cmudict_path", "heteronyms_path"):
        if dc.get(key):
            dc[key] = os.path.join(REPO, dc[key])
    from flowtron_tpu.data.dataset import data_kwargs
    kwargs = data_kwargs(dc)
    kwargs["prior_cache_path"] = ""
    d = Data(val, **kwargs)
    assert len(d) > 0
    _, text, sid = d.audiopaths_and_text[0]
    seq = d.get_text(text)
    assert seq.dtype == np.int64 and len(seq) > 0
    assert int(d.get_speaker_id(sid)) >= 0


def test_waveglow_config_constructs():
    from flowtron_tpu.vocoder import waveglow_init
    with open(os.path.join(REPO, "configs/config_waveglow.json")) as f:
        cfg = json.load(f)
    wg = dict(cfg["waveglow_config"])
    wg["n_channels"] = 32  # width-only shrink for CPU init speed
    params, config = waveglow_init(jax.random.PRNGKey(0), **wg)
    assert len(params["wn"]) == wg["n_flows"]
