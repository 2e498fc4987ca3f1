"""Config loader and dotted-override tests (reference:train.py:39-57)."""

import json

import pytest

from flowtron_tpu.config import load_config, update_params, DEFAULT_CONFIG


def test_defaults():
    cfg = load_config()
    assert cfg["model_config"]["n_flows"] == 2
    assert cfg["data_config"]["hop_length"] == 256
    assert cfg["train_config"]["optim_algo"] == "RAdam"


def test_json_merge(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"model_config": {"n_flows": 1}}))
    cfg = load_config(str(p))
    assert cfg["model_config"]["n_flows"] == 1
    # untouched keys keep defaults
    assert cfg["model_config"]["n_hidden"] == 1024


def test_dotted_overrides():
    cfg = load_config(overrides=[
        "model_config.n_flows=3",
        "train_config.learning_rate=2e-4",
        "data_config.text_cleaners=['basic_cleaners']",
    ])
    assert cfg["model_config"]["n_flows"] == 3
    assert cfg["train_config"]["learning_rate"] == 2e-4
    assert cfg["data_config"]["text_cleaners"] == ["basic_cleaners"]


def test_unknown_key_ignored(capsys):
    cfg = load_config(overrides=["model_config.not_a_key=5"])
    assert "not updated" in capsys.readouterr().out
    assert cfg["model_config"] == DEFAULT_CONFIG["model_config"]


def test_string_value_passthrough():
    cfg = load_config(overrides=["train_config.checkpoint_path=/tmp/x.ckpt"])
    assert cfg["train_config"]["checkpoint_path"] == "/tmp/x.ckpt"


class TestPackageAPI:
    def test_lazy_top_level_exports_resolve(self):
        """`from flowtron_tpu import X` works for the public surface
        (lazy __getattr__ — package import itself stays light)."""
        import flowtron_tpu
        for name in flowtron_tpu._EXPORTS:
            assert getattr(flowtron_tpu, name) is not None, name
        assert set(flowtron_tpu._EXPORTS) < set(dir(flowtron_tpu))
        with pytest.raises(AttributeError):
            flowtron_tpu.does_not_exist


def test_extension_keys_are_overridable():
    """Keys the code consumes beyond the reference's schema (remat,
    checkpoint_format, use_grain, grain_workers) must exist in
    DEFAULT_CONFIG — update_params drops unknown keys (reference
    semantics), so a missing default makes `-p a.b=c` a silent no-op."""
    cfg = load_config(overrides=[
        "train_config.remat=True",
        "train_config.checkpoint_format=orbax",
        "data_config.use_grain=True",
        "data_config.grain_workers=2",
    ])
    assert cfg["train_config"]["remat"] is True
    assert cfg["train_config"]["checkpoint_format"] == "orbax"
    assert cfg["data_config"]["use_grain"] is True
    assert cfg["data_config"]["grain_workers"] == 2


def test_every_consumed_config_key_has_a_default():
    """Source audit: every `<section>.get("key")` / `<section>["key"]`
    access in the package resolves to a DEFAULT_CONFIG key, so every
    consumed knob is reachable through `-p section.key=value`."""
    import os
    import re
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pat = re.compile(
        r'\b(train_config|data_config|model_config|dist_config)'
        r'(?:\.get\(\s*|\[)"([a-z_0-9]+)"')
    consumed = set()
    for dirpath, _, files in os.walk(os.path.join(pkg, "flowtron_tpu")):
        for fn in files:
            if fn.endswith(".py"):
                src = open(os.path.join(dirpath, fn),
                           encoding="utf-8").read()
                consumed |= {m.groups() for m in pat.finditer(src)}
    missing = sorted(
        f"{sec}.{key}" for sec, key in consumed
        if key not in DEFAULT_CONFIG[sec])
    assert not missing, missing
