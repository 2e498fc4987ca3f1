"""Checkpointing: native (orbax-style pytree) save/resume plus a PyTorch
state_dict bridge for the reference's published checkpoints.

Reference behaviors replicated (reference:train.py:85-139):
- ``warmstart``: partial load filtered by ``include_layers`` substrings,
  dropping a shape-mismatched speaker embedding.
- ``load_checkpoint``: full resume (params+optimizer+iteration);
  a non-empty ``ignore_layers`` drops those keys and skips the optimizer.
- ``finetune_layers``: every other parameter is frozen (here: a gradient
  mask built by ``finetune_mask``).
"""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# flat-name <-> pytree mapping (torch state_dict name space)
# ---------------------------------------------------------------------------

def _lstm_entries(prefix, lstm_params):
    """Yield (torch_name, array, transform) for an LSTM pytree."""
    for li, layer in enumerate(lstm_params["layers"]):
        if "fwd" in layer:
            dirs = [("", layer["fwd"]), ("_reverse", layer["bwd"])]
        else:
            dirs = [("", layer)]
        for suffix, p in dirs:
            yield f"{prefix}.weight_ih_l{li}{suffix}", p, "w_ih"
            yield f"{prefix}.weight_hh_l{li}{suffix}", p, "w_hh"
            yield f"{prefix}.bias_ih_l{li}{suffix}", p, "b_ih"
            yield f"{prefix}.bias_hh_l{li}{suffix}", p, "b_hh"


def _iter_named_params(params):
    """Yield (torch_name, set_fn, get_fn) for every model parameter.

    Names match the reference module tree so published checkpoints load
    directly. Linear weights transpose (torch (out,in) <-> ours (in,out));
    LSTM weights transpose similarly; 1x1 convs squeeze/unsqueeze their
    kernel axis.
    """
    entries = []

    def linear(name, p, has_bias=True):
        entries.append((f"{name}.weight", p, "linear_w"))
        if has_bias and "b" in p:
            entries.append((f"{name}.bias", p, "b"))

    entries.append(("speaker_embedding.weight",
                    params["speaker_embedding"], "table"))
    entries.append(("embedding.weight", params["embedding"], "table"))

    for ci, conv in enumerate(params["encoder"]["convolutions"]):
        entries.append((f"encoder.convolutions.{ci}.0.conv.weight",
                        conv["conv"], "w"))
        entries.append((f"encoder.convolutions.{ci}.0.conv.bias",
                        conv["conv"], "b"))
        entries.append((f"encoder.convolutions.{ci}.1.weight",
                        conv["norm"], "weight"))
        entries.append((f"encoder.convolutions.{ci}.1.bias",
                        conv["norm"], "bias"))
    for e in _lstm_entries("encoder.lstm", params["encoder"]["lstm"]):
        entries.append(e)

    if "mel_encoder" in params:
        me = params["mel_encoder"]
        for ci, conv in enumerate(me["convolutions"]):
            entries.append((f"mel_encoder.convolutions.{ci}.0.conv.weight",
                            conv["conv"], "w"))
            entries.append((f"mel_encoder.convolutions.{ci}.0.conv.bias",
                            conv["conv"], "b"))
            entries.append((f"mel_encoder.convolutions.{ci}.1.weight",
                            conv["norm"], "weight"))
            entries.append((f"mel_encoder.convolutions.{ci}.1.bias",
                            conv["norm"], "bias"))
        for e in _lstm_entries("mel_encoder.lstm", me["lstm"]):
            entries.append(e)

    if "gaussian_mixture" in params:
        gm = params["gaussian_mixture"]
        linear("gaussian_mixture.prob_layer.linear_layer", gm["prob_layer"])
        if "mean" in gm:  # fixed-gaussian buffers
            entries.append(("gaussian_mixture.mean", gm, "mean"))
            entries.append(("gaussian_mixture.log_var", gm, "log_var"))
        else:
            linear("gaussian_mixture.mean_layer.linear_layer",
                   gm["mean_layer"])
            linear("gaussian_mixture.log_var_layer.linear_layer",
                   gm["log_var_layer"])

    for fi, flow in enumerate(params["flows"]):
        pre = f"flows.{fi}"
        if fi % 2 == 1:
            pre = f"flows.{fi}.ar_step"
        entries.append((f"{pre}.conv.weight", flow["conv"], "conv1x1_w"))
        entries.append((f"{pre}.conv.bias", flow["conv"], "b"))
        for e in _lstm_entries(f"{pre}.lstm", flow["lstm"]):
            entries.append(e)
        for e in _lstm_entries(f"{pre}.attention_lstm",
                               flow["attention_lstm"]):
            entries.append(e)
        att = flow["attention_layer"]
        linear(f"{pre}.attention_layer.query.linear_layer", att["query"],
               has_bias=False)
        linear(f"{pre}.attention_layer.key.linear_layer", att["key"],
               has_bias=False)
        linear(f"{pre}.attention_layer.value.linear_layer", att["value"],
               has_bias=False)
        linear(f"{pre}.attention_layer.v.linear_layer", att["v"],
               has_bias=False)
        for di, dl in enumerate(flow["dense_layer"]["layers"]):
            linear(f"{pre}.dense_layer.layers.{di}.linear_layer", dl)
        if "gate_layer" in flow:
            linear(f"{pre}.gate_layer.linear_layer", flow["gate_layer"])
        if "attn_cond_layer" in flow:
            # the reference registers each conv TWICE — as an attribute
            # and inside an nn.Sequential (reference:flowtron.py:138-148)
            # — so its state_dict carries alias keys; emit/accept both
            # for strict round-trips
            acl = flow["attn_cond_layer"]
            for ours, theirs in (("conv_hidden", "location_conv_hidden"),
                                 ("conv_out", "location_conv_out"),
                                 ("conv_hidden", "conv_layers.0"),
                                 ("conv_out", "conv_layers.2")):
                entries.append((f"{pre}.attn_cond_layer.{theirs}.conv.weight",
                                acl[ours], "w"))
                entries.append((f"{pre}.attn_cond_layer.{theirs}.conv.bias",
                                acl[ours], "b"))

    return entries


_TO_TORCH = {
    "table": lambda a: a,
    "w": lambda a: a,            # conv (out, in, k): same layout
    "b": lambda a: a,
    "weight": lambda a: a,
    "bias": lambda a: a,
    "mean": lambda a: a,
    "log_var": lambda a: a,
    "linear_w": lambda a: a.T,   # ours (in, out) -> torch (out, in)
    "w_ih": lambda a: a.T,
    "w_hh": lambda a: a.T,
    "b_ih": lambda a: a,
    "b_hh": lambda a: a,
    "conv1x1_w": lambda a: a.T[:, :, None],  # (in,out) -> (out,in,1)
}

_FROM_TORCH = {
    "table": lambda a: a,
    "w": lambda a: a,
    "b": lambda a: a,
    "weight": lambda a: a,
    "bias": lambda a: a,
    "mean": lambda a: a,
    "log_var": lambda a: a,
    "linear_w": lambda a: a.T,
    "w_ih": lambda a: a.T,
    "w_hh": lambda a: a.T,
    "b_ih": lambda a: a,
    "b_hh": lambda a: a,
    "conv1x1_w": lambda a: a[:, :, 0].T,
}

_SLOT = {"linear_w": "w", "conv1x1_w": "w"}


def export_torch_state_dict(params):
    """Our pytree -> {reference torch name: numpy array}."""
    out = {}
    for name, subtree, kind in _iter_named_params(params):
        arr = np.asarray(subtree[_SLOT.get(kind, kind)])
        out[name] = _TO_TORCH[kind](arr)
    return out


def import_torch_state_dict(params, state_dict, include_layers=None,
                            strict=False):
    """Load a reference-format state_dict into a (template) pytree.

    include_layers: substring filter (warmstart semantics). Unknown keys
    are ignored unless strict. Returns (new_params, loaded_names).
    """
    loaded = []
    available = {}
    for name, subtree, kind in _iter_named_params(params):
        available[name] = (subtree, kind)

    for name, value in state_dict.items():
        if include_layers is not None and \
                not any(s in name for s in include_layers):
            continue
        if name not in available:
            if strict:
                raise KeyError(f"unexpected checkpoint key {name}")
            continue
        subtree, kind = available[name]
        arr = _FROM_TORCH[kind](np.asarray(value))
        slot = _SLOT.get(kind, kind)
        target = subtree[slot]
        if arr.shape != target.shape:
            # reference drops shape-mismatched speaker embeddings
            # (reference:train.py:101-103)
            if "speaker_embedding" in name:
                continue
            raise ValueError(f"{name}: shape {arr.shape} != {target.shape}")
        subtree[slot] = jnp.asarray(arr, target.dtype)
        loaded.append(name)
    return params, loaded


# ---------------------------------------------------------------------------
# native checkpoint save / resume
# ---------------------------------------------------------------------------

class AsyncSaver:
    """Background-thread checkpoint writer (SURVEY §5: periodic async
    checkpointing). Device arrays are snapshotted to host synchronously
    (cheap) and the disk write happens off the training thread."""

    def __init__(self):
        self._thread = None

    def save(self, path, params, opt_state, iteration, learning_rate,
             config=None, sharded=False, fmt=None):
        import threading
        self.wait()
        fmt = fmt or ("sharded" if sharded else "pickle")
        if fmt == "orbax":
            # orbax's AsyncCheckpointer owns the background write; a
            # waiter thread finalizes the meta.json marker afterwards
            from flowtron_tpu.train.orbax_ckpt import save_orbax
            ckptr, finalize = save_orbax(path, params, opt_state, iteration,
                                         learning_rate, config,
                                         use_async=True)

            def waiter():
                ckptr.wait_until_finished()
                finalize()
                ckptr.close()

            self._thread = threading.Thread(target=waiter, daemon=True)
            self._thread.start()
            return
        if fmt == "sharded":
            # snapshot per-shard on this thread (no full-array gather),
            # write files off-thread
            from flowtron_tpu.train.sharded_ckpt import snapshot, write_plan
            plan = snapshot(params, opt_state, iteration, learning_rate,
                            config)
            self._thread = threading.Thread(
                target=write_plan, args=(path, plan), daemon=True)
            self._thread.start()
            return
        host_params = jax.tree.map(np.asarray, params)
        host_opt = jax.tree.map(
            lambda x: np.asarray(x) if hasattr(x, "shape") else x, opt_state)
        self._thread = threading.Thread(
            target=_write_checkpoint,
            args=(path, host_params, host_opt, int(iteration),
                  float(learning_rate), config),
            daemon=True)
        self._thread.start()

    def wait(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None


def _write_checkpoint(path, host_params, host_opt, iteration,
                      learning_rate, config):
    payload = {
        "params": host_params,
        "opt_state": host_opt,
        "iteration": iteration,
        "learning_rate": learning_rate,
        "config": config,
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)


def save_checkpoint(path, params, opt_state, iteration, learning_rate,
                    config=None, sharded=False, fmt=None):
    fmt = fmt or ("sharded" if sharded else "pickle")
    if fmt == "orbax":
        from flowtron_tpu.train.orbax_ckpt import save_orbax
        save_orbax(path, params, opt_state, iteration, learning_rate, config)
        return
    if fmt == "sharded":
        from flowtron_tpu.train.sharded_ckpt import save_sharded
        save_sharded(path, params, opt_state, iteration, learning_rate,
                     config)
        return
    _write_checkpoint(
        path,
        jax.tree.map(np.asarray, params),
        jax.tree.map(lambda x: np.asarray(x) if hasattr(x, "shape") else x,
                     opt_state),
        int(iteration), float(learning_rate), config)


def load_checkpoint(path, params, opt_state=None, ignore_layers=()):
    """Resume. With ignore_layers, those params keep their fresh values and
    the optimizer state is NOT restored (reference:train.py:116-123).

    A directory path selects a directory format by marker file — orbax
    (orbax_ckpt.py, meta.json) or first-party sharded (sharded_ckpt.py,
    index.json). Both restores are sharding-aware: saved arrays land
    directly on the devices / layouts of the current `params` /
    `opt_state` templates."""
    if os.path.isdir(path):
        from flowtron_tpu.train.orbax_ckpt import (
            is_orbax_checkpoint, restore_orbax)
        if is_orbax_checkpoint(path):
            payload = restore_orbax(path, params, opt_state)
        else:
            from flowtron_tpu.train.sharded_ckpt import restore_sharded
            payload = restore_sharded(path, params, opt_state)
    else:
        with open(path, "rb") as f:
            payload = pickle.load(f)

    saved_params = payload["params"]
    if ignore_layers:
        flat_saved = _flatten(saved_params)
        flat_new = _flatten(params)
        for k in list(flat_saved):
            if k in ignore_layers:
                flat_saved[k] = flat_new[k]
        params = _unflatten(flat_saved, saved_params)
        restored_opt = opt_state  # keep fresh optimizer
    else:
        params = jax.tree.map(jnp.asarray, saved_params)
        restored_opt = jax.tree.map(
            lambda x: jnp.asarray(x) if hasattr(x, "shape") else x,
            payload["opt_state"]) if opt_state is not None else None
    return params, restored_opt, payload["iteration"], \
        payload["learning_rate"]


def warmstart(path, params, include_layers=None):
    """Partial init from a native or torch checkpoint file."""
    if path.endswith(".pt") or path.endswith(".pth"):
        import torch
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        sd = ckpt.get("state_dict", ckpt.get("model"))
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        sd = {k: v.numpy() if hasattr(v, "numpy") else v
              for k, v in sd.items()}
        params, _ = import_torch_state_dict(params, sd, include_layers)
        return params
    if os.path.isdir(path):
        from flowtron_tpu.train.orbax_ckpt import (
            is_orbax_checkpoint, restore_orbax_params_flat)
        if is_orbax_checkpoint(path):
            flat_saved = restore_orbax_params_flat(path)
        else:
            from flowtron_tpu.train.sharded_ckpt import restore_flat
            flat_saved = {k: v for k, v in restore_flat(path).items()
                          if not k.startswith("opt.")}
    else:
        with open(path, "rb") as f:
            payload = pickle.load(f)
        flat_saved = _flatten(payload["params"])
    flat_new = _flatten(params)
    for k, v in flat_saved.items():
        if include_layers is not None and \
                not any(s in k for s in include_layers):
            continue
        if k in flat_new and hasattr(v, "shape") and \
                flat_new[k].shape == v.shape:
            flat_new[k] = jnp.asarray(v)
    return _unflatten(flat_new, params)


def trainable_mask(params, finetune_layers=()):
    """Boolean pytree: True where the optimizer may update.

    Non-trainable buffers (fixed-gaussian mean/log_var) are always False;
    a non-empty finetune_layers restricts training to matching dotted
    paths (reference:train.py:223-228).
    """
    flat = _flatten(params)

    def keep(path):
        if "gaussian_mixture.mean" in path or \
                "gaussian_mixture.log_var" in path:
            return False
        if finetune_layers:
            return any(s in path for s in finetune_layers)
        return True

    mask = {k: keep(k) for k in flat}
    return _unflatten(mask, params)


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}."))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}."))
    else:
        out[prefix[:-1]] = tree
    return out


def _unflatten(flat, template, prefix=""):
    if isinstance(template, dict):
        return {k: _unflatten(flat, v, f"{prefix}{k}.")
                for k, v in template.items()}
    if isinstance(template, (list, tuple)):
        seq = [_unflatten(flat, v, f"{prefix}{i}.")
               for i, v in enumerate(template)]
        return type(template)(seq)
    return flat[prefix[:-1]]
