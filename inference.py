#!/usr/bin/env python
"""CLI shim: python inference.py -c config.json -f ckpt [-w vocoder]
-t "text" -i speaker_id (same contract as the reference)."""

from flowtron_tpu.cli import inference_main

if __name__ == "__main__":
    inference_main()
