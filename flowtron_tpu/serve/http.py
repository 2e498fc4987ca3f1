"""HTTP front end: request routing, model registry, chunked and
WebSocket streaming transports (see the package docstring for the
endpoint protocol)."""

import json
import threading
import time

from flowtron_tpu.serve.common import (EngineOverloaded, TextTooLong,
                                       UnknownModel, _log)
from flowtron_tpu.serve.wire import (_BodyTooLarge, _HTTP_MAX_BODY,
                                     _wav_bytes, _wav_stream_header,
                                     _ws_accept_key, _ws_recv, _ws_send)

def make_handler(engine, loader=None):
    """HTTP handler over one engine or a {name: engine} dict.

    Multi-model serving (beyond the reference, which ships two published
    checkpoints — LJS and LibriTTS — that a deployment wants resident at
    once): requests pick a voice with a "model" field; the first dict
    entry is the default. GET /models lists them. Single-engine response
    shapes (/healthz, /metrics) are unchanged.

    Runtime model management: when `loader(config_path, ckpt, vocoder)
    -> SynthesisEngine` is given, `POST /models` with
    {"name", "config", "checkpoint", "vocoder"?} loads a new voice
    without a restart, and `DELETE /models/<name>` shuts its engine
    down and frees its device memory. The last resident model cannot be
    unloaded; unloading the default promotes the next loaded model."""
    from http.server import BaseHTTPRequestHandler

    # NOT copied: runtime loads/unloads mutate the caller's dict, so
    # main()'s exit path shuts down runtime-loaded engines too
    engines = engine if isinstance(engine, dict) else {"default": engine}
    if not engines:
        raise ValueError("no models given")
    reg_lock = threading.Lock()
    reg = {"default": next(iter(engines)), "loading": set()}
    profile_lock = threading.Lock()  # one trace capture at a time

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"  # chunked transfer for /stream

        def log_message(self, fmt, *args):  # quiet
            pass

        def _engine(self, req):
            with reg_lock:
                name = req.get("model") or reg["default"]
                if name not in engines:
                    raise UnknownModel(name, set(engines))
                return engines[name]

        def _read_json_body(self):
            """Bounded request-body read: a client-declared
            Content-Length above _HTTP_MAX_BODY is rejected BEFORE any
            read/allocation (mirrors the _WS_MAX_FRAME discipline —
            text requests are <=128-id buckets, so 1 MB is generous)."""
            length = int(self.headers.get("Content-Length", 0))
            if length > _HTTP_MAX_BODY:
                raise _BodyTooLarge(length)
            return json.loads(self.rfile.read(length) or b"{}")

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            with reg_lock:
                snap = dict(engines)
                default_name = reg["default"]
            # keyed-by-model shapes only when actually multi-model, so
            # a plain single-model deployment keeps the flat /metrics
            # and /healthz responses regardless of loader availability
            multi = len(snap) > 1
            if self.path == "/healthz":
                depths = {n: e.queue_depth for n, e in snap.items()}
                out = {"status": "ok", "queue_depth": sum(depths.values())}
                if multi:
                    out["models"] = depths
                self._json(200, out)
            elif self.path == "/metrics":
                self._json(200, {n: e.metrics()
                                 for n, e in snap.items()} if multi
                           else snap[default_name].metrics())
            elif self.path == "/models":
                self._json(200, {
                    "default": default_name,
                    "models": [{
                        "name": n,
                        "can_stream": e.can_stream,
                        "sampling_rate": e.data_config["sampling_rate"],
                        "n_speakers": e.config["model_config"]
                        .get("n_speakers"),
                        # dataset speaker ids valid in "speaker_id"
                        # (dense model indices are looked up for you)
                        "speaker_ids": sorted(
                            int(s) for s in e.frontend.speaker_ids),
                    } for n, e in snap.items()]})
            elif self.path == "/stream-ws":
                self._do_stream_ws()
            elif self.path == "/":
                # discovery index: what this server speaks
                from flowtron_tpu import __version__
                self._json(200, {
                    "service": "flowtron_tpu",
                    "version": __version__,
                    "endpoints": {
                        "POST /synthesize": "full wav (json request)",
                        "POST /stream": "chunked-transfer wav",
                        "GET /stream-ws": "WebSocket: json in, "
                                          "pcm16 frames out",
                        "GET /models": "resident voices + speaker ids",
                        "POST /models": "load a voice at runtime",
                        "DELETE /models/<name>": "drain + unload",
                        "GET /metrics": "counters + latency percentiles",
                        "GET /healthz": "liveness + queue depth",
                        "POST /profile": "capture a device trace",
                    },
                    "request_fields": [
                        "text", "speaker_id", "sigma", "seed",
                        "n_frames", "temperature", "split", "denoise",
                        "model"],
                })
            else:
                self._json(404, {"error": "not found"})

        def _do_profile(self, req):
            """POST /profile: capture a jax.profiler device trace for
            `seconds` (clamped to 60) under whatever traffic is live,
            writing TensorBoard-readable files under `dir` (a fresh
            temp dir when omitted). Returns the directory; fetch it
            with TensorBoard's profile plugin. 409 when a capture is
            already running."""
            import tempfile
            try:
                seconds = min(60.0, max(0.05,
                                        float(req.get("seconds", 1.0))))
            except (TypeError, ValueError):
                self._json(400, {"error": "seconds must be a number"})
                return
            trace_dir = req.get("dir") or tempfile.mkdtemp(
                prefix="flowtron-trace-")
            if not profile_lock.acquire(blocking=False):
                self._json(409, {"error": "a profile capture is "
                                 "already running"})
                return
            try:
                import jax
                jax.profiler.start_trace(trace_dir)
                time.sleep(seconds)
                jax.profiler.stop_trace()
            except Exception as e:
                self._json(500, {"error": repr(e)})
                return
            finally:
                profile_lock.release()
            self._json(200, {"trace_dir": trace_dir,
                             "seconds": seconds})

        def do_DELETE(self):
            """DELETE /models/<name>: shut the engine down (drains its
            queue, finishes active streams, frees device memory) and
            remove the voice. 409 for the last resident model."""
            if not self.path.startswith("/models/"):
                self._json(404, {"error": "not found"})
                return
            name = self.path[len("/models/"):]
            # decide under the lock, write the response outside it — a
            # slow client socket must not block all registry operations
            eng = err = None
            with reg_lock:
                if name not in engines:
                    err = (404, {"error": f"unknown model {name!r}"})
                elif len(engines) == 1:
                    err = (409, {"error": "cannot unload the last "
                                 "resident model"})
                else:
                    eng = engines.pop(name)
                    if reg["default"] == name:
                        reg["default"] = next(iter(engines))
                    new_default = reg["default"]
            if err is not None:
                self._json(*err)
                return
            eng.shutdown()
            self._json(200, {"unloaded": name, "default": new_default})

        def _do_load_model(self, req):
            """POST /models: load a new voice at runtime. Builds the
            engine OUTSIDE the registry lock (checkpoint restore +
            tracing take seconds); a per-name loading set keeps
            concurrent loads of the same name to one winner (409)."""
            if loader is None:
                self._json(501, {"error": "runtime model loading is "
                                 "not enabled (start via the serve "
                                 "CLI, or pass make_handler a loader)"})
                return
            try:
                name = req["name"]
                config_path = req["config"]
                ckpt = req["checkpoint"]
            except KeyError as e:
                self._json(400, {"error": f"missing field {e}"})
                return
            with reg_lock:
                taken = name in engines or name in reg["loading"]
                if not taken:
                    reg["loading"].add(name)
            if taken:  # respond outside the lock
                self._json(409, {"error": f"model {name!r} is "
                                 "already loaded (or loading)"})
                return
            try:
                eng = loader(config_path, ckpt, req.get("vocoder", ""))
            except Exception as e:
                with reg_lock:
                    reg["loading"].discard(name)
                self._json(500, {"error": repr(e)})
                return
            # discard + insert atomically: a gap between them would let
            # a concurrent load of the same name win the slot and leak
            # this engine's threads and device memory
            with reg_lock:
                reg["loading"].discard(name)
                engines[name] = eng
            self._json(200, {"loaded": name,
                             "can_stream": eng.can_stream})

        def _do_stream_ws(self):
            """WebSocket streaming transport (RFC 6455, stdlib framing):
            client upgrades, sends ONE text frame with the /stream JSON
            body, receives a text frame {"sample_rate", "format"}, then
            binary frames of raw PCM16 mono, then a close frame. Errors
            arrive as a text frame {"error": ...} before close — framed
            and typed, unlike chunked WAV where an early disconnect is
            the only error signal."""
            key = self.headers.get("Sec-WebSocket-Key")
            if self.headers.get("Upgrade", "").lower() != "websocket" \
                    or not key:
                self._json(400, {"error": "expected websocket upgrade"})
                return
            with reg_lock:
                streamable = any(e.can_stream for e in engines.values())
            if not streamable:
                self._json(501, {"error": "streaming requires a "
                                 "neural vocoder (-w)"})
                return
            self.send_response(101, "Switching Protocols")
            self.send_header("Upgrade", "websocket")
            self.send_header("Connection", "Upgrade")
            self.send_header("Sec-WebSocket-Accept", _ws_accept_key(key))
            self.end_headers()
            self.close_connection = True

            def text(obj):
                _ws_send(self.wfile, json.dumps(obj).encode(), 1)

            gen = None
            try:
                opcode, payload = _ws_recv(self.rfile)
                if opcode != 1:  # expected one text frame with the req
                    text({"error": "expected a text frame with the "
                          "request JSON"})
                    _ws_send(self.wfile, b"\x03\xe8", 8)
                    return
                req = json.loads(payload or b"{}")
                eng = self._engine(req)
                if not eng.can_stream:
                    text({"error": "streaming requires a neural "
                          "vocoder (-w) on this model"})
                    _ws_send(self.wfile, b"\x03\xe8", 8)
                    return
                gen = eng.stream(
                    req["text"], req.get("speaker_id", 0),
                    req.get("sigma", 0.5), req.get("seed", 1234),
                    n_frames=req.get("n_frames"),
                    temperature=req.get("temperature"),
                    split=bool(req.get("split", False)),
                    denoise=req.get("denoise"))
                sr = eng.data_config["sampling_rate"]
                text({"sample_rate": sr, "format": "pcm16"})
                for pcm in gen:
                    if len(pcm):
                        _ws_send(self.wfile, pcm.tobytes(), 2)
                _ws_send(self.wfile, b"\x03\xe8", 8)  # close 1000
            except (BrokenPipeError, ConnectionResetError):
                pass  # client went away mid-stream
            except KeyError as e:
                text({"error": f"missing field {e}"})
                _ws_send(self.wfile, b"\x03\xe8", 8)
            except Exception as e:
                try:
                    text({"error": str(e)})
                    _ws_send(self.wfile, b"\x03\xe8", 8)
                except OSError:
                    _log.debug("client socket gone while sending the "
                               "websocket error frame", exc_info=True)
            finally:
                if gen is not None:
                    gen.close()  # release the streamers

        def do_POST(self):
            if self.path == "/stream":
                self._do_stream()
                return
            if self.path in ("/models", "/profile"):
                try:
                    req = self._read_json_body()
                except _BodyTooLarge as e:
                    self._json(413, {"error": str(e)})
                    return
                except Exception as e:
                    self._json(400, {"error": repr(e)})
                    return
                if self.path == "/models":
                    self._do_load_model(req)
                else:
                    self._do_profile(req)
                return
            if self.path != "/synthesize":
                self._json(404, {"error": "not found"})
                return
            try:
                req = self._read_json_body()
                text = req["text"]
                wav, sr = self._engine(req).submit(
                    text, req.get("speaker_id", 0),
                    req.get("sigma", 0.5), req.get("seed", 1234),
                    n_frames=req.get("n_frames"),
                    temperature=req.get("temperature"),
                    split=bool(req.get("split", False)),
                    denoise=req.get("denoise"))
                body = _wav_bytes(wav, sr)
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except KeyError as e:
                self._json(400, {"error": f"missing field {e}"})
            except UnknownModel as e:
                self._json(404, {"error": str(e)})
            except (TextTooLong, _BodyTooLarge) as e:
                self._json(413, {"error": str(e)})
            except EngineOverloaded as e:
                self._json(429, {"error": str(e)})
            except ValueError as e:
                self._json(400, {"error": str(e)})
            except Exception as e:
                self._json(500, {"error": repr(e)})

        def _do_stream(self):
            """Chunked-transfer WAV: audio bytes flow as synthesis runs
            (one mel chunk + vocoder lookahead to first byte)."""
            try:
                req = self._read_json_body()
                eng = self._engine(req)
                if not eng.can_stream:
                    self._json(501, {"error": "streaming requires a "
                                     "neural vocoder (-w)"})
                    return
                gen = eng.stream(
                    req["text"], req.get("speaker_id", 0),
                    req.get("sigma", 0.5), req.get("seed", 1234),
                    n_frames=req.get("n_frames"),
                    temperature=req.get("temperature"),
                    split=bool(req.get("split", False)),
                    denoise=req.get("denoise"))
            except KeyError as e:
                self._json(400, {"error": f"missing field {e}"})
                return
            except UnknownModel as e:
                self._json(404, {"error": str(e)})
                return
            except (TextTooLong, _BodyTooLarge) as e:
                self._json(413, {"error": str(e)})
                return
            except EngineOverloaded as e:
                self._json(429, {"error": str(e)})
                return
            except ValueError as e:  # request validation (empty text,
                self._json(400, {"error": str(e)})  # denoise w/o -d, ..)
                return
            except Exception as e:
                self._json(500, {"error": repr(e)})
                return
            sr = eng.data_config["sampling_rate"]
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
