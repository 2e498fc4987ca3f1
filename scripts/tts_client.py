"""Command-line client for the flowtron_tpu TTS server (stdlib only).

Counterpart to `python -m flowtron_tpu.serve`: submits one utterance
and writes the WAV, either as a single response (POST /synthesize) or
progressively as synthesis runs (POST /stream, chunked transfer —
prints time-to-first-audio). No JAX or heavy imports: usable from any
machine that can reach the server.

Usage:
  python scripts/tts_client.py "Hello world." -o hello.wav
  python scripts/tts_client.py "Long paragraph..." --split --stream
  python scripts/tts_client.py "Hi." --url http://host:8080 --model alt
"""

import argparse
import json
import sys
import time
import urllib.error
import urllib.request


def main(argv=None):
    p = argparse.ArgumentParser(description="flowtron_tpu TTS client")
    p.add_argument("text")
    p.add_argument("--url", default="http://localhost:8080")
    p.add_argument("-o", "--output", default="out.wav")
    p.add_argument("--model", default="")
    p.add_argument("-i", "--speaker-id", type=int, default=0)
    p.add_argument("-s", "--sigma", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("-n", "--n-frames", type=int, default=None)
    p.add_argument("-t", "--temperature", type=float, default=None)
    p.add_argument("-d", "--denoise", type=float, default=None,
                   help="denoiser strength override (server must run "
                        "with -d)")
    p.add_argument("--split", action="store_true",
                   help="let the server sentence-split text longer "
                        "than its largest bucket")
    p.add_argument("--stream", action="store_true",
                   help="POST /stream: write audio as synthesis runs")
    p.add_argument("--timeout", type=float, default=300.0)
    args = p.parse_args(argv)

    body = {"text": args.text, "speaker_id": args.speaker_id,
            "sigma": args.sigma, "seed": args.seed,
            "split": args.split}
    if args.model:
        body["model"] = args.model
    if args.n_frames is not None:
        body["n_frames"] = args.n_frames
    if args.temperature is not None:
        body["temperature"] = args.temperature
    if args.denoise is not None:
        body["denoise"] = args.denoise

    path = "/stream" if args.stream else "/synthesize"
    req = urllib.request.Request(
        args.url + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    t0 = time.perf_counter()
    try:
        with urllib.request.urlopen(req, timeout=args.timeout) as r, \
                open(args.output, "wb") as f:
            if args.stream:
                first = None
                total = 0
                while True:
                    chunk = r.read(16384)
                    if not chunk:
                        break
                    if first is None:
                        first = time.perf_counter() - t0
                    f.write(chunk)
                    total += len(chunk)
                print(f"{args.output}: {total} bytes, first audio "
                      f"{first * 1e3:.0f} ms, total "
                      f"{(time.perf_counter() - t0) * 1e3:.0f} ms")
            else:
                data = r.read()
                f.write(data)
                print(f"{args.output}: {len(data)} bytes in "
                      f"{(time.perf_counter() - t0) * 1e3:.0f} ms")
    except urllib.error.HTTPError as e:
        try:
            msg = json.loads(e.read()).get("error", "")
        except Exception:
            msg = ""
        print(f"HTTP {e.code}: {msg}", file=sys.stderr)
        return 1
    except (urllib.error.URLError, OSError) as e:
        print(f"connection failed: {e}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
