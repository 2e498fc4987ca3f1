#!/usr/bin/env python
"""CLI shim: python train.py -c config.json [-p a.b=c ...]
(same contract as the reference; thin wrapper over flowtron_tpu.cli)."""

from flowtron_tpu.cli import train_main

if __name__ == "__main__":
    train_main()
