"""Data pipeline tests: prior vs scipy, dataset loading, collation."""

import numpy as np
import pytest
from scipy.io import wavfile
from scipy.stats import betabinom

from flowtron_tpu.data import Data, DataCollate, BatchIterator
from flowtron_tpu.data.prior import beta_binomial_prior


class TestPrior:
    def test_matches_scipy(self):
        P, M, s = 7, 11, 1.0
        ours = beta_binomial_prior(P, M, s)
        x = np.arange(P)
        for i in range(1, M + 1):
            rv = betabinom(P - 1, s * i, s * (M + 1 - i))
            np.testing.assert_allclose(ours[i - 1], rv.pmf(x), atol=1e-6)

    def test_scaling_factor(self):
        P, M = 5, 9
        ours = beta_binomial_prior(P, M, 0.5)
        rv = betabinom(P - 1, 0.5 * 3, 0.5 * (M + 1 - 3))
        np.testing.assert_allclose(ours[2], rv.pmf(np.arange(P)), atol=1e-6)

    def test_rows_sum_to_one(self):
        prior = beta_binomial_prior(12, 40)
        np.testing.assert_allclose(prior.sum(1), 1.0, atol=1e-5)


@pytest.fixture(scope="module")
def tiny_corpus(tmp_path_factory, ):
    """Three tiny synthetic wav files + filelist."""
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    lines = []
    texts = ["The cat sat.", "A dog ran far away.", "Hello."]
    sids = [3, 7, 3]
    for i, (txt, sid) in enumerate(zip(texts, sids)):
        n = int(22050 * (0.3 + 0.2 * i))
        wav = (rng.standard_normal(n) * 3000).astype(np.int16)
        path = root / f"utt{i}.wav"
        wavfile.write(path, 22050, wav)
        lines.append(f"{path}|{txt}|{sid}")
    filelist = root / "files.txt"
    filelist.write_text("\n".join(lines) + "\n")
    return str(filelist)


class TestDataset:
    def test_getitem(self, tiny_corpus, mini_cmudict, mini_heteronyms):
        ds = Data(tiny_corpus, cmudict_path=mini_cmudict,
                  heteronyms_path=mini_heteronyms, p_arpabet=1.0,
                  use_attn_prior=True, randomize=False)
        mel, sid, text, prior = ds[0]
        assert mel.shape[0] == 80
        assert mel.dtype == np.float32
        assert text.ndim == 1 and text.dtype == np.int64
        assert prior.shape == (mel.shape[1], text.shape[0])
        assert sid in (0, 1)  # dense remap of {3, 7}

    def test_speaker_table_dense_sorted(self, tiny_corpus, mini_cmudict):
        ds = Data(tiny_corpus, cmudict_path=mini_cmudict, randomize=False)
        assert ds.speaker_ids == {3: 0, 7: 1}

    def test_sr_mismatch_raises(self, tmp_path, mini_cmudict):
        wav = (np.zeros(8000)).astype(np.int16)
        p = tmp_path / "bad.wav"
        wavfile.write(p, 16000, wav)
        fl = tmp_path / "fl.txt"
        fl.write_text(f"{p}|hi|0\n")
        ds = Data(str(fl), cmudict_path=mini_cmudict, randomize=False)
        with pytest.raises(ValueError, match="SR"):
            ds[0]

    def test_prior_cache(self, tiny_corpus, mini_cmudict, tmp_path):
        cache = tmp_path / "prior_cache"
        ds = Data(tiny_corpus, cmudict_path=mini_cmudict, p_arpabet=1.0,
                  use_attn_prior=True, prior_cache_path=str(cache),
                  randomize=False)
        assert ds.caching_enabled
        _, _, _, p1 = ds[0]
        assert len(list(cache.iterdir())) == 1
        _, _, _, p2 = ds[0]  # second read hits the cache
        np.testing.assert_allclose(p1, p2)

    def test_no_cache_when_parpabet_random(self, tiny_corpus, mini_cmudict,
                                           tmp_path):
        ds = Data(tiny_corpus, cmudict_path=mini_cmudict, p_arpabet=0.5,
                  use_attn_prior=True,
                  prior_cache_path=str(tmp_path / "c"), randomize=False)
        assert not ds.caching_enabled


class TestCollate:
    def _fake_batch(self):
        rng = np.random.default_rng(1)
        batch = []
        for T, Tk, sid in [(20, 5, 0), (14, 9, 1), (17, 3, 0)]:
            mel = rng.standard_normal((80, T)).astype(np.float32)
            text = rng.integers(1, 100, Tk)
            prior = rng.uniform(0, 1, (T, Tk)).astype(np.float32)
            batch.append((mel, sid, text, prior))
        return batch

    def test_shapes_and_sorting(self):
        out = DataCollate(use_attn_prior=True)(self._fake_batch())
        assert out["mel"].shape == (3, 80, 20)
        assert out["text"].shape == (3, 9)
        # sorted by text length desc: 9, 5, 3
        np.testing.assert_array_equal(out["in_lens"], [9, 5, 3])
        np.testing.assert_array_equal(out["out_lens"], [14, 20, 17])
        assert out["attn_prior"].shape == (3, 20, 9)

    def test_gate_targets(self):
        out = DataCollate(use_attn_prior=False)(self._fake_batch())
        # gate = 1 from last real frame onward (reference:data.py:235)
        for b in range(3):
            L = out["out_lens"][b]
            assert (out["gate_target"][b, L - 1:] == 1).all()
            assert (out["gate_target"][b, :L - 1] == 0).all()

    def test_pad_to_multiple(self):
        out = DataCollate(use_attn_prior=True,
                          pad_to_multiple=16)(self._fake_batch())
        assert out["mel"].shape[2] == 32
        assert out["text"].shape[1] == 16
        assert out["attn_prior"].shape == (3, 32, 16)

    def test_batch_iterator(self):
        class FakeDs:
            def __len__(self):
                return 7

            def __getitem__(self, i):
                rng = np.random.default_rng(i)
                return (rng.standard_normal((80, 10 + i)).astype(np.float32),
                        0, np.arange(1, 4 + i), None)

        it = BatchIterator(FakeDs(), 2, DataCollate(), seed=0)
        batches = list(it)
        assert len(batches) == 3  # drop_last
        assert all(b["mel"].shape[0] == 2 for b in batches)

    def test_batch_iterator_process_sharding(self):
        """Multi-host data sharding: same seeded permutation, disjoint
        strides, equal per-process lengths (DistributedSampler role)."""
        class FakeDs:
            def __len__(self):
                return 7

            def __getitem__(self, i):
                rng = np.random.default_rng(i)
                return (rng.standard_normal((80, 10 + i)).astype(np.float32),
                        i, np.arange(1, 4), None)

        shards = [BatchIterator(FakeDs(), 2, DataCollate(), seed=0,
                                shuffle=True, num_shards=2, shard_index=p)
                  for p in range(2)]
        assert len(shards[0]) == len(shards[1]) == 2  # ceil(7/2)=4 -> 2
        seen = [np.concatenate([b["speaker_ids"] for b in s])
                for s in shards]
        # lockstep batch counts and near-disjoint coverage (one
        # wrap-around pad allowed on the short shard)
        assert len(seen[0]) == len(seen[1]) == 4
        all_ids = np.concatenate(seen)
        assert len(np.unique(all_ids)) >= 7


class TestNative:
    @pytest.fixture(scope="class")
    def native_lib(self):
        from flowtron_tpu import native
        if not native.available():
            try:
                assert native.build()
            except Exception:
                pytest.skip("no C++ toolchain available")
        return native

    def test_mel_parity(self, native_lib):
        from flowtron_tpu.audio import MelSpectrogram
        ms = MelSpectrogram()
        nm = native_lib.NativeMel(np.asarray(ms.window),
                                  np.asarray(ms.mel_basis))
        rng = np.random.default_rng(0)
        audio = (rng.standard_normal(11025) * 0.1).astype(np.float32)
        np.testing.assert_allclose(nm(audio), ms.mel_numpy(audio),
                                   atol=1e-5)

    def test_wav_decode_parity(self, native_lib, tmp_path):
        rng = np.random.default_rng(1)
        pcm = (rng.standard_normal(5000) * 8000).astype(np.int16)
        p = tmp_path / "x.wav"
        wavfile.write(p, 22050, pcm)
        dec, sr = native_lib.decode_wav(str(p))
        assert sr == 22050
        np.testing.assert_array_equal(dec, pcm.astype(np.float32))

    def test_dataset_native_path(self, native_lib, tiny_corpus,
                                 mini_cmudict):
        ds = Data(tiny_corpus, cmudict_path=mini_cmudict, randomize=False,
                  use_native=True)
        assert ds._native_mel is not None
        mel, sid, text, _ = ds[0]
        ds2 = Data(tiny_corpus, cmudict_path=mini_cmudict, randomize=False)
        mel2, _, _, _ = ds2[0]
        np.testing.assert_allclose(mel, mel2, atol=1e-5)


class TestMelCache:
    def test_cache_roundtrip(self, tiny_corpus, mini_cmudict, tmp_path):
        cache = str(tmp_path / "melcache")
        ds = Data(tiny_corpus, cmudict_path=mini_cmudict, randomize=False,
                  mel_cache_path=cache)
        mel1, _, _, _ = ds[0]
        import os
        assert len(os.listdir(cache)) == 1
        mel2, _, _, _ = ds[0]
        np.testing.assert_array_equal(mel1, mel2)


class TestPrefetch:
    def test_prefetch_yields_all_batches(self):
        from flowtron_tpu.data import PrefetchIterator

        class FakeDs:
            def __len__(self):
                return 6

            def __getitem__(self, i):
                rng = np.random.default_rng(i)
                return (rng.standard_normal((80, 10)).astype(np.float32),
                        0, np.arange(1, 5), None)

        base = BatchIterator(FakeDs(), 2, DataCollate(), seed=0)
        pre = PrefetchIterator(base)
        assert len(pre) == 3
        direct = [b["out_lens"].tolist() for b in base]
        # reset rng state by constructing a fresh iterator
        base2 = BatchIterator(FakeDs(), 2, DataCollate(), seed=0)
        fetched = [b["out_lens"].tolist()
                   for b in PrefetchIterator(base2)]
        assert len(fetched) == 3

    def test_prefetch_propagates_errors(self):
        from flowtron_tpu.data import PrefetchIterator

        def gen():
            yield 1
            raise ValueError("boom")

        with pytest.raises(ValueError, match="boom"):
            list(PrefetchIterator(gen()))


class _ToyDataset:
    """Tiny in-memory dataset with the Data item contract."""

    def __init__(self, n=11, n_mel=4):
        rng = np.random.default_rng(0)
        self.items = []
        for i in range(n):
            mel = rng.standard_normal((n_mel, 3 + i % 3)).astype(np.float32)
            text = np.arange(1, 2 + i % 4, dtype=np.int64)
            self.items.append((mel, i % 2, text, None))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


class TestGrainLoader:
    """grain-based pipeline (data_config.use_grain) mirrors the
    first-party BatchIterator semantics."""

    def _make(self, **kw):
        from flowtron_tpu.data.grain_pipeline import GrainLoader
        ds = _ToyDataset()
        collate = DataCollate(use_attn_prior=False)
        return GrainLoader(ds, 2, collate, **kw)

    def test_epoch_batches_and_determinism(self):
        loader = self._make(shuffle=True, seed=5)
        ep1 = list(loader)
        assert len(ep1) == len(loader) == 5  # 11 // 2, drop_last
        ep2 = list(loader)
        # fresh shuffle each epoch...
        assert not all(
            np.array_equal(a["speaker_ids"], b["speaker_ids"])
            and np.array_equal(a["in_lens"], b["in_lens"])
            for a, b in zip(ep1, ep2))
        # ...but the same seed reproduces the same epoch sequence
        again = list(self._make(shuffle=True, seed=5))
        for a, b in zip(ep1, again):
            for k in ("mel", "text", "speaker_ids", "in_lens", "out_lens"):
                np.testing.assert_array_equal(a[k], b[k], err_msg=k)

    def test_sharding_disjoint_and_lockstep(self):
        loaders = [self._make(shuffle=True, seed=7, num_shards=3,
                              shard_index=i) for i in range(3)]
        epochs = [list(ld) for ld in loaders]
        # all processes see the same number of batches (lockstep)
        assert len({len(e) for e in epochs}) == 1
        # shards are disjoint: collect (sid, in_len, out_len) fingerprints
        def keys(ep):
            out = set()
            for b in ep:
                for j in range(len(b["speaker_ids"])):
                    out.add((int(b["speaker_ids"][j]), int(b["in_lens"][j]),
                             int(b["out_lens"][j]),
                             round(float(b["mel"][j].sum()), 4)))
            return out
        k0, k1, k2 = (keys(e) for e in epochs)
        assert not (k0 & k1) and not (k0 & k2) and not (k1 & k2)

    def test_collate_matches_batchiterator(self):
        """Same underlying collate: unshuffled grain epoch == BatchIterator
        epoch batch-for-batch."""
        ds = _ToyDataset()
        collate = DataCollate(use_attn_prior=False)
        from flowtron_tpu.data.grain_pipeline import GrainLoader
        g = list(GrainLoader(ds, 2, collate, shuffle=False))
        b = list(BatchIterator(ds, 2, collate, shuffle=False))
        assert len(g) == len(b)
        for x, y in zip(g, b):
            for k in ("mel", "text", "speaker_ids", "in_lens", "out_lens",
                      "gate_target"):
                np.testing.assert_array_equal(x[k], y[k], err_msg=k)


class TestDataKwargs:
    def test_filters_loader_keys(self):
        from flowtron_tpu.data.dataset import data_kwargs
        cfg = {"training_files": "a", "validation_files": "b",
               "p_arpabet": 1.0, "use_grain": True, "grain_workers": 2,
               "hop_length": 256}
        out = data_kwargs(cfg)
        assert out == {"p_arpabet": 1.0, "hop_length": 256}


class TestMelDumpCLI:
    def test_data_py_dumps_mels(self, tiny_corpus, tmp_path):
        """repo-root data.py (reference:data.py:253-283 contract) as a
        real subprocess: one .npy per wav, equal to Data.get_mel."""
        import json
        import os
        import subprocess
        import sys

        cfg = {"data_config": {
            "training_files": tiny_corpus,
            "validation_files": tiny_corpus,
            "p_arpabet": 0.0, "cmudict_path": "", "heteronyms_path": "",
            "use_attn_prior": False}}
        cfg_path = tmp_path / "cfg.json"
        cfg_path.write_text(json.dumps(cfg))
        out_dir = tmp_path / "mels"
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        r = subprocess.run(
            [sys.executable, os.path.join(repo, "data.py"),
             "-c", str(cfg_path), "-f", tiny_corpus,
             "-o", str(out_dir)],
            env=dict(os.environ, FLOWTRON_PLATFORM="cpu"),
            capture_output=True, text=True, timeout=600, cwd=repo)
        assert r.returncode == 0, r.stderr

        from flowtron_tpu.data import load_filepaths_and_text, load_wav
        ds = Data(tiny_corpus, p_arpabet=0.0, use_attn_prior=False)
        entries = load_filepaths_and_text(tiny_corpus)
        assert len(entries) == 3
        for path, _, _ in entries:
            dumped = np.load(out_dir / (os.path.basename(path) + ".npy"))
            audio, _ = load_wav(path)
            np.testing.assert_allclose(dumped, ds.get_mel(audio),
                                       atol=1e-5)
