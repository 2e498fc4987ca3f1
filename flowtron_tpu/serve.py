"""Serving runtime: HTTP TTS endpoint with dynamic request batching.

The reference has no serving story (inference.py is a one-shot CLI); this
module provides the production path the framework targets: a warm jitted
synthesis function at fixed shape buckets, a micro-batching queue that
coalesces concurrent requests into one TPU dispatch, and a thread-pool
HTTP front end.

POST /synthesize  {"text": "...", "speaker_id": 0, "sigma": 0.5,
                   "n_frames": 400, "seed": 1234}
  -> audio/wav bytes (Griffin-Lim fallback or WaveGlow when loaded)
POST /stream      same body -> chunked-transfer audio/wav: bytes flow
                  as synthesis runs (forward-only models + vocoder;
                  see infer/streaming.py)
GET /healthz      -> {"status": "ok", "queue_depth": N}
GET /metrics      -> request/batch/error counters, synthesized audio
                  seconds, recent batch-latency percentiles

Run: python -m flowtron_tpu.serve -c config.json -f ckpt [-w vocoder]
     [--port 8080 --max-batch 8 --batch-timeout-ms 20]
"""

import argparse
import io
import json
import queue
import threading
import time

import numpy as np


class SynthesisEngine:
    """Batched synthesis over fixed shape buckets (one jit program per
    (batch, text) bucket; requests are padded up)."""

    def __init__(self, config, flowtron_path, waveglow_path="",
                 max_batch=8, batch_timeout_ms=20.0, text_buckets=(64, 128),
                 n_frames=400, int8=False, quantize="", fused=False,
                 mesh_shape=None, bf16=False):
        import jax
        import jax.numpy as jnp
        from flowtron_tpu.infer.sampling import load_model_for_inference
        from flowtron_tpu.models import flowtron_infer
        from flowtron_tpu.data import Data

        self.jax, self.jnp = jax, jnp
        self.config = config
        self.n_frames = n_frames
        self.max_batch = max_batch
        self.batch_timeout = batch_timeout_ms / 1000.0
        self.text_buckets = sorted(text_buckets)

        data_config = dict(config["data_config"])
        self.data_config = data_config
        self.params, self.static_cfg = load_model_for_inference(
            config, flowtron_path)
        qmode = quantize or ("w8" if int8 else "")
        if qmode:
            from flowtron_tpu.infer.quantize import \
                quantize_flows_for_inference
            self.params = quantize_flows_for_inference(self.params,
                                                       mode=qmode)
        elif bf16:
            # TPU serving dtype: ~+30% over fp32 (mel MAE ~1e-3 scale);
            # quantized modes already handle their own dtypes
            self.params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                self.params)
        self._bf16 = bool(bf16)

        from flowtron_tpu.data.dataset import data_kwargs
        self.frontend = Data(data_config["training_files"],
                             **data_kwargs(data_config))

        self.wg = None
        self._vocode_batch = None
        if waveglow_path:
            from flowtron_tpu.vocoder import load_waveglow, waveglow_infer
            self.wg = load_waveglow(waveglow_path)
            if bf16:
                wgp, wgc = self.wg
                self.wg = (jax.tree.map(
                    lambda x: x.astype(jnp.bfloat16)
                    if hasattr(x, "dtype") and x.dtype == jnp.float32
                    else x, wgp), wgc)
            _wg_cfg = self.wg[1]

            # jitted batched vocode: WITHOUT jit this is hundreds of
            # eager dispatches per request (~seconds each over a remote
            # device); batching amortizes one dispatch across the whole
            # micro-batch, and peak-normalization + int16 on device
            # halves the device->host audio transfer
            def vocode(p, m, n_samples):
                audio = waveglow_infer(p, _wg_cfg, m,
                                       sigma=0.8).astype(jnp.float32)
                valid = (jnp.arange(audio.shape[1])[None, :]
                         < n_samples[:, None])
                peak = jnp.max(jnp.abs(audio) * valid, axis=1,
                               keepdims=True)
                out = audio / jnp.maximum(peak, 1e-8) * valid
                return jnp.clip(out * 32767.0, -32767, 32767
                                ).astype(jnp.int16)

            self._vocode_batch = jax.jit(vocode)

        def synth(params, residual, sids, text, in_lens):
            return flowtron_infer(params, self.static_cfg, residual, sids,
                                  text, gate_threshold=0.5, in_lens=in_lens,
                                  fused="early" if fused else False)

        _zshape = (self.static_cfg["n_mel_channels"], n_frames)
        # NOTE: the int64->int32 wrap of large seeds is byte-identical
        # to the per-request PRNGKey(int(seed)) this replaced — PRNGKey
        # keeps only the low 32 bits under default x64-disabled JAX, and
        # two's-complement preserves that bit pattern (verified).
        self._sample_z = jax.jit(lambda seeds, sigmas: jax.vmap(
            lambda s, sg: sg * jax.random.normal(
                jax.random.PRNGKey(s), _zshape))(seeds, sigmas))

        self._batch_mult = 1
        if mesh_shape:
            # multi-chip serving: weights tensor-parallel over 'model',
            # requests data-parallel over 'data' (GSPMD inserts the
            # per-step collectives inside the AR scan over ICI)
            from flowtron_tpu.parallel.mesh import (
                make_mesh, place_params, param_shardings, data_sharded)
            mesh = make_mesh(tuple(mesh_shape), ("data", "model"))
            self.params = place_params(self.params, mesh)
            pshard = param_shardings(self.params, mesh)
            bshard = data_sharded(mesh)
            self._batch_mult = int(mesh.shape["data"])
            self._synth = jax.jit(
                synth, in_shardings=(pshard, bshard, bshard, bshard,
                                     bshard))
        else:
            self._synth = jax.jit(synth)

        # streaming path: forward-only model + neural vocoder required.
        # One warm streamer pair reused across requests (serialized by a
        # lock — streaming is the latency path, not the throughput path).
        self._streamers = None
        self._stream_lock = threading.Lock()
        if self.static_cfg["n_flows"] == 1 and self.wg is not None:
            from flowtron_tpu.infer.streaming import (
                StreamingMelSynthesizer, StreamingVocoder)
            wg_params, wg_cfg = self.wg
            self._streamers = (
                StreamingMelSynthesizer(self.params, self.static_cfg,
                                        chunk_frames=40,
                                        gate_threshold=0.5,
                                        max_frames=n_frames),
                StreamingVocoder(wg_params, wg_cfg,
                                 jax.random.PRNGKey(0), sigma=0.8,
                                 dtype=jnp.bfloat16 if bf16
                                 else jnp.float32))

        # serving metrics (GET /metrics): counters + recent batch
        # latencies, updated by the batching worker
        self._metrics = {"requests": 0, "batches": 0, "errors": 0,
                         "audio_seconds": 0.0, "stream_requests": 0}
        self._recent_batch_ms = []
        self._metrics_lock = threading.Lock()

        self._queue = queue.Queue()
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    @property
    def can_stream(self):
        return self._streamers is not None

    def stream(self, text, speaker_id=0, sigma=0.5, seed=1234):
        """Mono int16 PCM chunk generator (time-to-first-audio is one
        mel chunk + vocoder lookahead). Requires n_flows == 1 and a
        loaded vocoder; amplitude uses a fixed clip scale (a streaming
        response cannot be normalized to its own global peak).

        Validation runs eagerly (not at first next()) so HTTP callers
        can still return 4xx/5xx before committing to a 200 + chunked
        response."""
        if self._streamers is None:
            raise RuntimeError(
                "streaming requires a forward-only model (n_flows=1) "
                "and a neural vocoder (-w)")
        ids = self.frontend.get_text(text)
        if len(ids) == 0:
            raise ValueError("empty text after cleaning")
        Tk = self._bucket(len(ids))
        text_pad = np.zeros((1, Tk), np.int64)
        n = min(len(ids), Tk)
        text_pad[0, :n] = np.asarray(ids)[:n]
        sid = int(self.frontend.speaker_ids.get(int(speaker_id), 0))
        with self._metrics_lock:
            self._metrics["stream_requests"] += 1
        return self._stream_gen(text_pad, n, sid, sigma, seed)

    def _stream_gen(self, text_pad, n, sid, sigma, seed):
        from flowtron_tpu.infer.streaming import pump_stream
        jnp = self.jnp
        with self._stream_lock:
            mel_s, voc = self._streamers
            k_mel, k_voc = self.jax.random.split(
                self.jax.random.PRNGKey(int(seed)))
            voc.reset(k_voc)
            for audio in pump_stream(
                    mel_s, voc, k_mel, jnp.asarray([sid]),
                    jnp.asarray(text_pad), sigma=float(sigma),
                    in_lens=jnp.asarray([n])):
                chunk = np.clip(audio[0], -1.0, 1.0)
                yield (chunk * 32767).astype(np.int16)

    # -- request path -----------------------------------------------------
    def submit(self, text, speaker_id=0, sigma=0.5, seed=1234):
        """Blocking: returns (wav_int16, sample_rate)."""
        done = threading.Event()
        slot = {}
        self._queue.put((text, speaker_id, sigma, seed, slot, done))
        done.wait()
        if "error" in slot:
            raise RuntimeError(slot["error"])
        return slot["wav"], self.data_config["sampling_rate"]

    @property
    def queue_depth(self):
        return self._queue.qsize()

    # -- batching worker ---------------------------------------------------
    def _bucket(self, n):
        for b in self.text_buckets:
            if n <= b:
                return b
        return self.text_buckets[-1]

    def _loop(self):
        while True:
            first = self._queue.get()
            batch = [first]
            deadline = time.time() + self.batch_timeout
            while len(batch) < self.max_batch:
                timeout = deadline - time.time()
                if timeout <= 0:
                    break
                try:
                    batch.append(self._queue.get(timeout=timeout))
                except queue.Empty:
                    break
            t0 = time.time()
            try:
                self._run_batch(batch)
                with self._metrics_lock:
                    self._metrics["requests"] += len(batch)
                    self._metrics["batches"] += 1
                    self._recent_batch_ms.append(
                        (time.time() - t0) * 1e3)
                    del self._recent_batch_ms[:-100]
            except Exception as e:  # pragma: no cover
                with self._metrics_lock:
                    self._metrics["errors"] += len(batch)
                for *_, slot, done in batch:
                    slot["error"] = repr(e)
                    done.set()

    def metrics(self):
        with self._metrics_lock:
            recent = list(self._recent_batch_ms)
            out = dict(self._metrics)
        out["queue_depth"] = self.queue_depth
        if recent:
            r = sorted(recent)
            out["batch_ms_p50"] = round(r[len(r) // 2], 1)
            out["batch_ms_p90"] = round(r[int(len(r) * 0.9)], 1)
        return out

    def _run_batch(self, batch):
        jnp = self.jnp
        ids_list, keep = [], []
        for text, sid, sigma, seed, slot, done in batch:
            ids = self.frontend.get_text(text)
            if len(ids) == 0:
                slot["error"] = "empty text after cleaning"
                done.set()
                continue
            ids_list.append(ids)
            keep.append((text, sid, sigma, seed, slot, done))
        if not keep:
            return
        batch = keep

        Tk = self._bucket(max(len(i) for i in ids_list))
        # bucket the batch dim to a power of two (bounded set of
        # compiled programs under bursty load) and to a multiple of the
        # mesh's data axis; padded rows duplicate row 0
        B = 1
        while B < len(batch):
            B *= 2
        m = self._batch_mult
        B = ((B + m - 1) // m) * m
        text_pad = np.zeros((B, Tk), np.int64)
        in_lens = np.zeros((B,), np.int64)
        sids = np.zeros((B,), np.int64)
        seeds = np.zeros((B,), np.int64)
        sigmas = np.full((B,), 0.5, np.float32)
        for b, (ids, (_, sid, sigma, seed, _, _)) in enumerate(
                zip(ids_list, batch)):
            n = min(len(ids), Tk)
            text_pad[b, :n] = ids[:n]
            in_lens[b] = n
            sids[b] = int(self.frontend.speaker_ids.get(int(sid), 0))
            seeds[b] = int(seed)
            sigmas[b] = float(sigma)
        for b in range(len(batch), B):  # mesh padding: duplicate row 0
            text_pad[b], in_lens[b] = text_pad[0], in_lens[0]
            sids[b], seeds[b], sigmas[b] = sids[0], seeds[0], sigmas[0]

        # whole batch's latents in ONE device dispatch (a per-request
        # PRNGKey + normal pair costs a device round-trip each)
        res = self._sample_z(jnp.asarray(seeds), jnp.asarray(sigmas))
        if self._bf16:
            res = res.astype(jnp.bfloat16)
        mel, attns, n_valid = self._synth(
            self.params, res, jnp.asarray(sids),
            jnp.asarray(text_pad), jnp.asarray(in_lens))
        mel = np.asarray(mel, np.float32)
        n_valid = np.asarray(n_valid)

        audio_all = None
        if self._vocode_batch is not None:
            # one batched vocoder dispatch for the whole micro-batch:
            # silence-pad every mel past its n_valid to the common
            # 64-frame bucket, trim per request after
            Tb = -(-int(max(1, n_valid[:len(batch)].max())) // 64) * 64
            mel_b = np.full((B, mel.shape[1], Tb), np.log(1e-5),
                            np.float32)
            for b in range(len(batch)):
                n = max(1, int(n_valid[b]))
                mel_b[b, :, :n] = mel[b, :, :n]
            m = jnp.asarray(mel_b)
            if self._bf16:
                m = m.astype(jnp.bfloat16)
            n_samples = jnp.asarray(
                np.maximum(1, n_valid[:B]).astype(np.int32) * 256)
            audio_all = np.asarray(
                self._vocode_batch(self.wg[0], m, n_samples))

        for b, (text, sid, sigma, seed, slot, done) in enumerate(batch):
            n = max(1, int(n_valid[b]))
            if audio_all is not None:
                slot["wav"] = audio_all[b, :n * 256]
            else:
                audio = self._vocode(mel[b, :, :n])
                audio = audio / max(1e-8, np.abs(audio).max())
                slot["wav"] = (audio * 32767).astype(np.int16)
            done.set()
        with self._metrics_lock:
            self._metrics["audio_seconds"] += float(
                np.maximum(1, n_valid[:len(batch)]).sum() * 256
                / self.data_config["sampling_rate"])

    def _vocode(self, mel):
        """Griffin-Lim fallback for engines without a neural vocoder
        (the vocoder path is the jitted batched _vocode_batch)."""
        from flowtron_tpu.infer.sampling import mel_to_audio_griffinlim
        return mel_to_audio_griffinlim(mel, self.data_config, n_iters=20)


def _wav_bytes(wav_int16, sr):
    from scipy.io import wavfile
    buf = io.BytesIO()
    wavfile.write(buf, sr, wav_int16)
    return buf.getvalue()


def _wav_stream_header(sr):
    """RIFF/WAVE header with unknown (0xFFFFFFFF) sizes — the standard
    convention for live PCM16 mono streams; players read to EOF."""
    import struct
    return (b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVEfmt " +
            struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16) +
            b"data" + struct.pack("<I", 0xFFFFFFFF))


def make_handler(engine):
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"  # chunked transfer for /stream

        def log_message(self, fmt, *args):  # quiet
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok",
                                 "queue_depth": engine.queue_depth})
            elif self.path == "/metrics":
                self._json(200, engine.metrics())
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path == "/stream":
                self._do_stream()
                return
            if self.path != "/synthesize":
                self._json(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                text = req["text"]
                wav, sr = engine.submit(
                    text, req.get("speaker_id", 0),
                    req.get("sigma", 0.5), req.get("seed", 1234))
                body = _wav_bytes(wav, sr)
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except KeyError as e:
                self._json(400, {"error": f"missing field {e}"})
            except Exception as e:
                self._json(500, {"error": repr(e)})

        def _do_stream(self):
            """Chunked-transfer WAV: audio bytes flow as synthesis runs
            (one mel chunk + vocoder lookahead to first byte)."""
            if not engine.can_stream:
                self._json(501, {"error": "streaming requires a "
                                 "forward-only (n_flows=1) model and a "
                                 "neural vocoder"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                gen = engine.stream(
                    req["text"], req.get("speaker_id", 0),
                    req.get("sigma", 0.5), req.get("seed", 1234))
            except KeyError as e:
                self._json(400, {"error": f"missing field {e}"})
                return
            except Exception as e:
                self._json(500, {"error": repr(e)})
                return
            sr = engine.data_config["sampling_rate"]
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

            def write_chunk(b):
                self.wfile.write(f"{len(b):X}\r\n".encode() + b + b"\r\n")

            try:
                write_chunk(_wav_stream_header(sr))
                for pcm in gen:
                    if len(pcm):
                        write_chunk(pcm.tobytes())
                self.wfile.write(b"0\r\n\r\n")
            finally:
                gen.close()  # client disconnect: release the streamers

    return Handler


def main(argv=None):
    parser = argparse.ArgumentParser(description="Flowtron-TPU TTS server")
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("-p", "--params", nargs="+", default=[])
    parser.add_argument("-f", "--flowtron_path", required=True)
    parser.add_argument("-w", "--waveglow_path", default="")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--max-batch", type=int, default=8)
    parser.add_argument("--batch-timeout-ms", type=float, default=20.0)
    parser.add_argument("--n-frames", type=int, default=400)
    parser.add_argument("--int8", action="store_true",
                        help="int8 weight-only flows (alias: --quantize w8)")
    parser.add_argument("--quantize", choices=("w8", "w8a8", "w4"),
                        default="", help="flow-weight quantization mode")
    parser.add_argument("--fused", action="store_true",
                        help="VMEM-resident fused decoder kernel (best for "
                             "small max-batch / latency-sensitive serving)")
    parser.add_argument("--mesh", default="",
                        help="multi-chip serving mesh 'data,model', e.g. "
                             "'2,4': weights tensor-parallel over model, "
                             "requests sharded over data")
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 weights/activations (the TPU "
                             "serving dtype; ~+30%% over fp32)")
    args = parser.parse_args(argv)

    from flowtron_tpu.cli import _apply_platform_override
    _apply_platform_override()
    from flowtron_tpu.config import load_config
    config = load_config(args.config, args.params)

    engine = SynthesisEngine(config, args.flowtron_path, args.waveglow_path,
                             max_batch=args.max_batch,
                             batch_timeout_ms=args.batch_timeout_ms,
                             n_frames=args.n_frames, int8=args.int8,
                             quantize=args.quantize, fused=args.fused,
                             mesh_shape=[int(x) for x in
                                         args.mesh.split(",")]
                             if args.mesh else None, bf16=args.bf16)

    from http.server import ThreadingHTTPServer
    server = ThreadingHTTPServer(("0.0.0.0", args.port),
                                 make_handler(engine))
    print(f"serving on :{args.port} (max_batch={args.max_batch})")
    server.serve_forever()


if __name__ == "__main__":
    main()
