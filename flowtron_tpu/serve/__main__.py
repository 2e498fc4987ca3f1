"""`python -m flowtron_tpu.serve` entry point."""

from flowtron_tpu.serve.cli import main

main()
