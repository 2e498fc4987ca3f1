"""Command-line entry points.

Mirrors the reference CLI contract (reference:train.py:380-415,
reference:inference.py:93-132): ``-c config.json`` plus ``-p a.b=c``
dotted overrides.
"""

import argparse
import os

from flowtron_tpu.config import load_config


def _apply_platform_override():
    """Honor FLOWTRON_PLATFORM=cpu|tpu even where a site hook pins
    JAX_PLATFORMS (this container's axon hook overrides the plain env)."""
    platform = os.environ.get("FLOWTRON_PLATFORM")
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)


def train_main(argv=None):
    parser = argparse.ArgumentParser(description="Train Flowtron-TPU")
    parser.add_argument("-c", "--config", type=str, required=True,
                        help="JSON file for configuration")
    parser.add_argument("-p", "--params", nargs="+", default=[],
                        help="dotted-path overrides: a.b.c=value")
    args = parser.parse_args(argv)

    _apply_platform_override()
    config = load_config(args.config, args.params)
    from flowtron_tpu.train.loop import train
    train(config)


def inference_main(argv=None):
    parser = argparse.ArgumentParser(description="Flowtron-TPU inference")
    parser.add_argument("-c", "--config", type=str, required=True)
    parser.add_argument("-p", "--params", nargs="+", default=[])
    parser.add_argument("-f", "--flowtron_path", type=str, required=True,
                        help="path to flowtron checkpoint")
    parser.add_argument("-w", "--waveglow_path", type=str, default="",
                        help="path to vocoder checkpoint (optional)")
    parser.add_argument("-t", "--text", type=str, required=True)
    parser.add_argument("-i", "--id", type=int, default=0,
                        help="speaker id")
    parser.add_argument("-n", "--n_frames", type=int, default=400)
    parser.add_argument("-s", "--sigma", type=float, default=0.5)
    parser.add_argument("-g", "--gate", type=float, default=0.5)
    parser.add_argument("-o", "--output_dir", type=str, default="results")
    parser.add_argument("--seed", type=int, default=1234)
    parser.add_argument("-d", "--denoise", type=float, default=0.0,
                        help="denoiser strength (0 = off; needs -w)")
    parser.add_argument("--int8", action="store_true",
                        help="int8 weight-only flows (faster serving mode; "
                             "alias for --quantize w8)")
    parser.add_argument("--quantize", choices=("w8", "w8a8", "w4"),
                        default="",
                        help="flow-weight quantization serving mode: w8 = "
                             "int8 weights, w8a8 = int8 weights+activations "
                             "(MXU int8 path), w4 = packed int4 weights "
                             "(lowest HBM traffic)")
    parser.add_argument("--fused", action="store_true",
                        help="VMEM-resident fused decoder kernel (fastest "
                             "single-stream latency; incompatible with "
                             "--quantize)")
    parser.add_argument("--stream", action="store_true",
                        help="write the wav incrementally as synthesis "
                             "runs (any n_flows + vocoder -w; see "
                             "infer/streaming.py)")
    args = parser.parse_args(argv)

    _apply_platform_override()
    config = load_config(args.config, args.params)
    from flowtron_tpu.infer.sampling import run_inference
    run_inference(config, args)


def evaluate_main(argv=None):
    """Standalone checkpoint health check: validation nll/gate/ctc over
    the config's validation filelist + the invertibility oracle —
    without starting a training run (the reference exposes validation
    only inside train(), reference:train.py:142-202)."""
    import json

    parser = argparse.ArgumentParser(
        description="Evaluate a Flowtron-TPU checkpoint")
    parser.add_argument("-c", "--config", type=str, required=True)
    parser.add_argument("-p", "--params", nargs="+", default=[])
    parser.add_argument("-f", "--flowtron_path", type=str, required=True,
                        help="checkpoint (pickle/sharded/orbax/torch "
                             "state_dict)")
    parser.add_argument("--invertibility-frames", type=int, default=100,
                        help="latent frames for the round-trip oracle "
                             "(0 disables it)")
    parser.add_argument("--seed", type=int, default=1234)
    parser.add_argument("--plots", type=str, default="",
                        help="directory for attention.png/gate.png of a "
                             "validation batch (the reference's visual "
                             "health check, without TensorBoard)")
    parser.add_argument("--tone-cer", type=int, default=0,
                        help="synthesize this many validation transcripts "
                             "and report the tone-CER intelligibility "
                             "metric (coded-tone corpora only; 0 "
                             "disables)")
    args = parser.parse_args(argv)

    _apply_platform_override()
    config = load_config(args.config, args.params)
    from flowtron_tpu.train.evaluate import evaluate
    result = evaluate(config, args.flowtron_path,
                      invertibility_frames=args.invertibility_frames,
                      seed=args.seed, plots_dir=args.plots or None,
                      tone_cer_texts=args.tone_cer)
    print(json.dumps({k: round(v, 6) for k, v in result.items()}))
    return 0  # console_scripts sys.exit()s the return value


if __name__ == "__main__":
    train_main()
