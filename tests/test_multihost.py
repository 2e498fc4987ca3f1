"""REAL two-process multi-host integration (VERDICT round-2 item 1).

The rest of the suite runs multi-DEVICE but single-PROCESS; the
coordination-service barriers, per-process data paths,
make_array_from_process_local_data, the sharded-checkpoint multi-host
protocol, orbax's process-0-only swap, and the grain shard pipeline are
only truly exercised by spawning coordinated OS processes. This test
runs tests/multihost_runner.py as:

  * one 1-process x 8-device reference run
  * one 2-process x 4-device run (gloo collectives between processes)

and asserts train/val loss parity across the two topologies (dropout is
withheld in the runner so losses are batch-order invariant), bitwise
agreement between the two coordinated processes, successful
cross-process sharded+orbax checkpoint round-trips, and a working
multi-process grain epoch over a shared (raced) mel cache.

Matches the reference's multi-process NCCL rendezvous role
(reference:distributed.py:28-44) and SURVEY §5's distributed-test story.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow
from scipy.io import wavfile

RUNNER = os.path.join(os.path.dirname(__file__), "multihost_runner.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _make_corpus(root):
    """8 equal-length utterances (equal lengths keep the per-shard
    collate buckets identical across processes)."""
    rng = np.random.default_rng(0)
    lines = []
    texts = ["the cat sat here", "a dog ran past it", "we read the book",
             "birds fly up high", "rain fell all day", "she sang a song",
             "he ate his lunch", "they walk to town"]
    for i, text in enumerate(texts):
        wav = (rng.standard_normal(8192) * 2000).astype(np.int16)
        wavfile.write(root / f"u{i}.wav", 22050, wav)
        lines.append(f"{root}/u{i}.wav|{text}|{i % 2}")
    (root / "filelist.txt").write_text("\n".join(lines) + "\n")


def _spawn(workdir, nproc, pid, port, devices_per_proc, steps=3):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # the runner sets its own device count
    # Hermeticity: the runner is launched in script mode, which puts
    # tests/ (not the repo root) on sys.path — inject the repo root so
    # `import flowtron_tpu` works without ambient PYTHONPATH help.
    repo_root = os.path.dirname(os.path.dirname(RUNNER))
    env["PYTHONPATH"] = repo_root + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    return subprocess.Popen(
        [sys.executable, RUNNER, "--workdir", str(workdir),
         "--nproc", str(nproc), "--pid", str(pid), "--port", str(port),
         "--devices-per-proc", str(devices_per_proc),
         "--steps", str(steps)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, cwd=os.path.dirname(os.path.dirname(RUNNER)))


def _wait(proc, name, timeout=900):
    try:
        out, _ = proc.communicate(timeout=timeout)
    except subprocess.TimeoutExpired:
        proc.kill()
        out, _ = proc.communicate()
        pytest.fail(f"{name} timed out; output:\n{out[-4000:]}")
    assert proc.returncode == 0, f"{name} failed:\n{out[-4000:]}"
    return out


@pytest.fixture(scope="module")
def results(tmp_path_factory):
    root = tmp_path_factory.mktemp("multihost")
    _make_corpus(root)

    # reference: 1 process x 8 devices over the same corpus content
    p = _spawn(root, 1, 0, 0, devices_per_proc=8)
    _wait(p, "single-process reference")

    # two coordinated processes x 4 devices
    mh_dir = root / "mh"
    mh_dir.mkdir()
    _make_corpus(mh_dir)
    port = _free_port()
    procs = [_spawn(mh_dir, 2, pid, port, devices_per_proc=4)
             for pid in range(2)]
    outs = [_wait(p, f"process {i}") for i, p in enumerate(procs)]
    for i, out in enumerate(outs):
        assert "RUNNER_DONE" in out, f"process {i}:\n{out[-2000:]}"

    def load(d, nproc, pid):
        with open(d / f"result_{nproc}proc_{pid}.json") as f:
            return json.load(f)

    return load(root, 1, 0), load(mh_dir, 2, 0), load(mh_dir, 2, 1)


class TestTwoProcessParity:
    def test_topology(self, results):
        ref, p0, p1 = results
        assert ref["process_count"] == 1 and ref["n_devices"] == 8
        assert p0["process_count"] == 2 and p0["n_devices"] == 8
        assert p1["process_count"] == 2

    def test_train_losses_match_single_process(self, results):
        """Same global batch content (order-invariant: no dropout) ->
        same losses across 1x8 and 2x4 topologies."""
        ref, p0, _ = results
        np.testing.assert_allclose(p0["train_losses"],
                                   ref["train_losses"], atol=1e-4)

    def test_processes_agree_bitwise(self, results):
        """Both coordinated processes compute the identical global
        step — losses and final parameter checksums must agree."""
        _, p0, p1 = results
        assert p0["train_losses"] == p1["train_losses"]
        assert p0["param_checksum"] == p1["param_checksum"]
        assert p0["val"] == p1["val"]

    def test_validation_matches_single_process(self, results):
        ref, p0, _ = results
        np.testing.assert_allclose(p0["val"]["nll"], ref["val"]["nll"],
                                   atol=1e-4)
        np.testing.assert_allclose(p0["val"]["gate"], ref["val"]["gate"],
                                   atol=1e-4)

    def test_sharded_checkpoint_cross_process(self, results):
        _, p0, p1 = results
        assert p0["sharded_restore_ok"] and p1["sharded_restore_ok"]

    def test_orbax_checkpoint_cross_process(self, results):
        _, p0, p1 = results
        assert p0["orbax_restore_ok"] and p1["orbax_restore_ok"]

    def test_grain_multiprocess_with_shared_cache(self, results):
        ref, p0, p1 = results
        assert p0["grain_losses"] == p1["grain_losses"]
        assert np.isfinite(p0["grain_losses"]).all()
        # shared mel cache: 8 utterances -> 8 cache files, no corrupt
        # duplicates from the concurrent writers
        assert p0["mel_cache_files"] == 8
