"""Default-config smoke: the unmodified repo config.json must be runnable.

Pins round-1 VERDICT missing item #1: the vendored text-frontend data
assets (``data/cmudict_dictionary``, ``data/heteronyms``, ``filelists/*``)
exist in-tree and the default ``config.json`` constructs a working ``Data``
whose ``get_text`` performs real ARPAbet substitution (reference behavior:
reference:text/__init__.py:80-107, reference:data.py:60-109).
"""

import os

import numpy as np
import pytest

from flowtron_tpu.config import load_config, update_params
from flowtron_tpu.data.dataset import Data
from flowtron_tpu.text import sequence_to_text
from flowtron_tpu.text.symbols import symbols

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_CHAR_SYMBOLS = 101  # ids >= 101 are @ARPAbet phonemes (symbols.py)


def _abs_data_config(cfg):
    """Default config paths are repo-root-relative; make them absolute."""
    dc = dict(cfg["data_config"])
    for key in ("training_files", "validation_files", "cmudict_path",
                "heteronyms_path"):
        if dc.get(key):
            dc[key] = os.path.join(REPO, dc[key])
    return dc


@pytest.fixture(scope="module")
def default_data():
    cfg = load_config(os.path.join(REPO, "config.json"))
    dc = _abs_data_config(cfg)
    from flowtron_tpu.data.dataset import data_kwargs
    return Data(dc["validation_files"], **data_kwargs(dc))


def test_assets_vendored():
    cmu = os.path.join(REPO, "data", "cmudict_dictionary")
    het = os.path.join(REPO, "data", "heteronyms")
    assert os.path.exists(cmu) and os.path.exists(het)
    with open(cmu, encoding="latin-1") as f:
        n_cmu = sum(1 for _ in f)
    with open(het) as f:
        heteronyms = [w.strip() for w in f if w.strip()]
    assert n_cmu > 130_000          # reference ships 133,952 lines
    assert len(heteronyms) == 413   # reference:data/heteronyms
    assert "read" in heteronyms
    for name in ("ljs_audiopaths_text_sid_train_filelist.txt",
                 "ljs_audiopaths_text_sid_val_filelist.txt"):
        assert os.path.exists(os.path.join(REPO, "filelists", name))


def test_data_from_default_config(default_data):
    d = default_data
    # 57 newline-terminated lines + 1 unterminated final line = 58 entries
    # (identical under the reference's loader, reference:data.py:44-48)
    assert len(d) == 58
    assert d.speaker_ids == {0: 0}           # single-speaker LJS
    assert d.cmudict is not None and len(d.cmudict) > 100_000
    # text from the filelist round-trips with real ARPAbet substitution
    _, text, sid = d.audiopaths_and_text[0]
    seq = d.get_text(text)
    assert seq.dtype == np.int64 and seq.ndim == 1 and len(seq) > 0
    assert np.all((seq >= 0) & (seq < len(symbols)))
    # p_arpabet=0.5 with the default seed substitutes some words
    assert np.any(seq >= N_CHAR_SYMBOLS), "no ARPAbet ids produced"
    assert "{" in sequence_to_text(seq.tolist())
    assert int(d.get_speaker_id(sid)) == 0


def test_full_arpabet_and_heteronym_skip():
    cfg = load_config(os.path.join(REPO, "config.json"))
    update_params(cfg, ["data_config.p_arpabet=1.0"])
    dc = _abs_data_config(cfg)
    from flowtron_tpu.data.dataset import data_kwargs
    kwargs = data_kwargs(dc)
    kwargs["prior_cache_path"] = ""  # don't create cache dirs in a test
    d = Data(dc["validation_files"], **kwargs)
    text = sequence_to_text(d.get_text("I read the book now.").tolist())
    # heteronyms are never phonemized (reference:text/__init__.py:93-95)
    assert "read" in text and "{" not in text.split()[1]
    # non-heteronym dictionary words all substituted at p=1.0
    assert text.count("{") >= 3
