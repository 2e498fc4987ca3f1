"""Export a flowtron_tpu checkpoint to the reference's torch format.

Writes a ``{"state_dict": {...}}`` .pt file with the exact tensor names
and layouts the reference loads (reference:inference.py:51-56 —
``model.load_state_dict(torch.load(path)['state_dict'])``), so a model
trained here can be validated or served in the PyTorch reference, and
round-tripped back through our importer (train/checkpoints.py; the
name/layout map is pinned by tests/test_torch_bridge.py against real
nn.Modules).

Usage:
  python scripts/export_torch.py -c config.json -f our_ckpt -o model.pt
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser(
        description="export a flowtron_tpu checkpoint as a reference-"
                    "format torch state_dict")
    p.add_argument("-c", "--config", required=True)
    p.add_argument("-p", "--params", nargs="+", default=[])
    p.add_argument("-f", "--flowtron_path", required=True,
                   help="our checkpoint (pickle/sharded/orbax)")
    p.add_argument("-o", "--output", required=True, help=".pt path")
    args = p.parse_args(argv)

    from flowtron_tpu.cli import _apply_platform_override
    _apply_platform_override()
    from flowtron_tpu.config import load_config
    from flowtron_tpu.infer.sampling import load_model_for_inference
    from flowtron_tpu.train.checkpoints import export_torch_state_dict

    config = load_config(args.config, args.params)
    params, _ = load_model_for_inference(config, args.flowtron_path)
    state = export_torch_state_dict(params)

    import torch
    torch.save({"state_dict": {k: torch.from_numpy(v.copy())
                               for k, v in state.items()}},
               args.output)
    n_params = sum(v.size for v in state.values())
    print(f"wrote {args.output}: {len(state)} tensors, "
          f"{n_params:,} parameters")
    return 0


if __name__ == "__main__":
    sys.exit(main())
