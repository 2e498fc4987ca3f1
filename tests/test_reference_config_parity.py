"""Config-override parity against the reference's ACTUAL update_params.

The `-p a.b=c` dotted-override mini-language IS the reference's public
CLI contract (reference:train.py:39-57). This module imports the
reference's real train.py (with the same librosa/text shims the data
parity uses — train.py pulls in data.py at import) and drives its
`update_params` next to ours over the reference's own shipped
config.json, comparing the resulting config trees byte-for-byte —
including the quirks: ast.literal_eval fallbacks, the str(v)
re-stringify in the nested recursion, and unknown keys being reported
but never added.

One intentional divergence is pinned as such: the reference splits on
EVERY '=' (`param.split("=")`), so a value containing '=' crashes with
ValueError; ours splits once and accepts it. Matching a crash would
make the CLI strictly worse, so the test asserts the reference raises
where ours succeeds.
"""

import copy
import importlib.util
import json
import os
import sys

import pytest

from flowtron_tpu.config import update_params as our_update_params

from tests.test_reference_data_parity import _fake_librosa, _fake_text

REF_ROOT = "/root/reference"
REF_TRAIN = os.path.join(REF_ROOT, "train.py")

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    not os.path.exists(REF_TRAIN),
    reason="reference checkout not available")]


@pytest.fixture(scope="module")
def ref_train():
    """Import the reference's train.py (needs its repo on sys.path for
    `from flowtron import ...` etc., plus the librosa/text shims for
    the data.py import chain)."""
    inject = {}
    inject.update(_fake_librosa())
    inject.update(_fake_text())
    saved = {k: sys.modules.get(k) for k in list(inject)}
    sys.modules.update(inject)
    sys.path.insert(0, REF_ROOT)
    try:
        spec = importlib.util.spec_from_file_location(
            "reference_train", REF_TRAIN)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        sys.path.remove(REF_ROOT)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _ref_config():
    with open(os.path.join(REF_ROOT, "config.json")) as f:
        return json.load(f)


OVERRIDE_BATTERIES = [
    ["train_config.batch_size=4"],
    ["train_config.learning_rate=1e-4"],
    ["model_config.dummy_speaker_embedding=True",
     "model_config.n_flows=3"],
    ["data_config.training_files=filelists/train.txt"],    # dotted str
    ["data_config.text_cleaners=['flowtron_cleaners']"],    # list value
    ["train_config.seed=0x10"],                             # hex literal
    ["model_config.no_such_key=1"],                         # unknown leaf
    ["data_config.sampling_rate=22050",
     "train_config.sigma=0.5",
     "model_config.n_hidden=256"],
    ["train_config.output_directory="],                     # empty value
    ["train_config.fp16_run=False"],
    ["data_config.mel_fmax=None"],                          # None literal
]


class TestReferenceUpdateParamsParity:
    @pytest.mark.parametrize("overrides", OVERRIDE_BATTERIES)
    def test_tree_equal(self, ref_train, overrides):
        base = _ref_config()
        ref_cfg = copy.deepcopy(base)
        our_cfg = copy.deepcopy(base)
        ref_train.update_params(ref_cfg, list(overrides))
        our_update_params(our_cfg, list(overrides))
        assert our_cfg == ref_cfg, overrides

    def test_unknown_toplevel_not_added(self, ref_train):
        base = _ref_config()
        ref_cfg = copy.deepcopy(base)
        our_cfg = copy.deepcopy(base)
        ref_train.update_params(ref_cfg, ["seed=1"])
        our_update_params(our_cfg, ["seed=1"])
        assert our_cfg == ref_cfg == base

    def test_equals_in_value_divergence_pinned(self, ref_train):
        """reference:train.py:41 `param.split(\"=\")` unpacks into
        exactly two names, so any '=' inside the value raises; ours
        splits once and keeps the remainder as the value."""
        ov = "train_config.output_directory=/tmp/run=a"
        with pytest.raises(ValueError):
            ref_train.update_params(_ref_config(), [ov])
        cfg = _ref_config()
        our_update_params(cfg, [ov])
        assert cfg["train_config"]["output_directory"] == "/tmp/run=a"
