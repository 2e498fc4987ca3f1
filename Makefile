.PHONY: test test-fast bench dryrun native smoke clean

test:            ## full suite on the 8-device virtual CPU mesh (~12 min)
	python -m pytest tests/ -q

test-fast:       ## everything except the slow train-integration module
	python -m pytest tests/ -q --ignore=tests/test_train.py

bench:           ## canonical one-line JSON benchmark (real TPU)
	python bench.py

dryrun:          ## multi-chip sharding dry run on virtual CPU devices
	python __graft_entry__.py

native:          ## build the C++ data-pipeline library
	sh flowtron_tpu/native/build.sh

smoke:           ## 2-epoch end-to-end training on a generated tiny corpus
	python - <<'EOF'
	import numpy as np, os
	from scipy.io import wavfile
	os.makedirs("/tmp/fw_smoke/filelists", exist_ok=True)
	rng = np.random.default_rng(0)
	lines = []
	for i in range(4):
	    wav = (rng.standard_normal(11025) * 2000).astype(np.int16)
	    wavfile.write(f"/tmp/fw_smoke/u{i}.wav", 22050, wav)
	    lines.append(f"/tmp/fw_smoke/u{i}.wav|test utterance {i}.|0")
	open("/tmp/fw_smoke/filelists/train.txt", "w").write("\n".join(lines[:3]) + "\n")
	open("/tmp/fw_smoke/filelists/val.txt", "w").write(lines[3] + "\n")
	EOF
	FLOWTRON_PLATFORM=cpu python train.py -c config.json -p \
	    data_config.training_files=/tmp/fw_smoke/filelists/train.txt \
	    data_config.validation_files=/tmp/fw_smoke/filelists/val.txt \
	    data_config.cmudict_path= data_config.heteronyms_path= \
	    data_config.prior_cache_path= \
	    model_config.n_hidden=32 model_config.n_attn_channels=16 \
	    model_config.n_text_dim=32 model_config.n_speaker_dim=16 \
	    train_config.epochs=2 train_config.batch_size=1 \
	    train_config.output_directory=/tmp/fw_smoke/out

clean:
	rm -rf .jax_cache_cpu outdir /tmp/fw_smoke
