"""Training loop: jit-compiled DP train step, validation, checkpointing.

Replaces reference:train.py:205-377. Differences by design:
- one process drives the whole mesh (no per-GPU processes / NCCL
  rendezvous); gradients are averaged by XLA-inserted collectives
- bf16-on-TPU replaces AMP GradScaler (fp16_run selects the policy);
  loss/statistics accumulate in fp32
- collate pads to shape buckets so jit reuses a small set of programs
"""

import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from flowtron_tpu.models import flowtron_init, flowtron_forward
from flowtron_tpu.train.loss import flowtron_loss
from flowtron_tpu.train.radam import build_optimizer, masked_optimizer
from flowtron_tpu.train.checkpoints import (
    AsyncSaver, load_checkpoint, warmstart, trainable_mask,
)
from flowtron_tpu.data import (
    Data, DataCollate, BatchIterator, PrefetchIterator,
)
from flowtron_tpu.parallel.mesh import (
    make_mesh, replicated, data_sharded, place_params,
    maybe_initialize_distributed, batch_shard_size,
)


def prior_strength_schedule(iteration, start_iter, end_iter):
    """Attention-prior anneal: full scaffold (1.0) before start_iter,
    linear ramp to 0.0 at end_iter, prior-free after. end_iter=0
    disables the schedule (constant full prior, reference behavior)."""
    if end_iter <= 0 or iteration <= start_iter:
        return 1.0
    if iteration >= end_iter:
        return 0.0
    return 1.0 - (iteration - start_iter) / float(end_iter - start_iter)


def make_train_step(model_config_static, mesh, optimizer, train_config):
    """Build the jitted DP training step."""
    sigma = train_config["sigma"]
    gm_loss = bool(model_config_static["n_components"])
    gate_loss = bool(train_config.get("gate_loss", True))
    use_ctc = bool(train_config.get("use_ctc_loss", False))
    blank_logprob = float(train_config.get("blank_logprob", -1))
    # fp16_run selects the bfloat16 compute policy on TPU
    compute_dtype = jnp.bfloat16 if train_config.get("fp16_run") else None
    # remat = scan-level rematerialization: the LSTM scans skip the hoisted
    # (T, B, 4H) projection buffers and recompute per-step gates in the
    # backward pass (ops/lstm.py lstm_single_direction(remat=True))
    use_remat = bool(train_config.get("remat"))
    anneal_end = int(train_config.get("prior_anneal_end_iter", 0))

    def step(params, opt_state, batch, dropout_key, ctc_weight,
             prior_strength):
        # continuous prior anneal: the attention applies the prior as an
        # additive log term (models/attention.py:83-85), so raising the
        # prior to the power lambda scales that term by lambda —
        # lambda=1 is the full beta-binomial scaffold, lambda=0 a
        # uniform (no-op) prior. The 1e-20 base epsilon mirrors the
        # attention's own log epsilon so zero cells soften gradually
        # instead of snapping open at lambda=0.
        attn_prior = batch.get("attn_prior")
        if attn_prior is not None and anneal_end > 0:
            attn_prior = (attn_prior + 1e-20) ** prior_strength

        def loss_fn(p):
            out = flowtron_forward(
                p, model_config_static, batch["mel"], batch["speaker_ids"],
                batch["text"], batch["in_lens"], batch["out_lens"],
                attn_prior=attn_prior, train=True,
                dropout_key=dropout_key, compute_dtype=compute_dtype,
                remat_scans=use_remat)
            nll, gate, ctc = flowtron_loss(
                out, batch["gate_target"], batch["in_lens"],
                batch["out_lens"], sigma=sigma, gm_loss=gm_loss,
                gate_loss=gate_loss, use_ctc_loss=use_ctc,
                blank_logprob=blank_logprob)
            total = nll + gate + ctc * ctc_weight
            return total, (nll, gate, ctc)

        (loss, (nll, gate, ctc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {"loss": loss, "nll": nll, "gate": gate, "ctc": ctc}
        return params, opt_state, metrics

    repl = replicated(mesh)
    bshard = data_sharded(mesh)
    # params/opt_state shardings are inherited from their placement
    # (replicated for pure DP; last-axis 'model'-sharded big weights when
    # the mesh has a model axis — see parallel.mesh.place_params)
    return jax.jit(
        step,
        in_shardings=(None, None, bshard, repl, repl, repl),
        donate_argnums=(0, 1),
    )


def make_eval_step(model_config_static, mesh, train_config):
    sigma = train_config["sigma"]
    gm_loss = bool(model_config_static["n_components"])
    gate_loss = bool(train_config.get("gate_loss", True))
    use_ctc = bool(train_config.get("use_ctc_loss", False))
    blank_logprob = float(train_config.get("blank_logprob", -1))

    def step(params, batch):
        out = flowtron_forward(
            params, model_config_static, batch["mel"], batch["speaker_ids"],
            batch["text"], batch["in_lens"], batch["out_lens"],
            attn_prior=batch.get("attn_prior"), train=False)
        nll, gate, ctc = flowtron_loss(
            out, batch["gate_target"], batch["in_lens"], batch["out_lens"],
            sigma=sigma, gm_loss=gm_loss, gate_loss=gate_loss,
            use_ctc_loss=use_ctc, blank_logprob=blank_logprob)
        # last flow's attention + gate predictions for plotting
        attn = out[3][-1]
        gate_pred = out[2]
        return {"nll": nll, "gate": gate, "ctc": ctc,
                "attn": attn, "gate_pred": gate_pred}

    bshard = data_sharded(mesh)
    return jax.jit(step, in_shardings=(None, bshard),
                   out_shardings=None)


def prepare_dataloaders(data_config, batch_size, seed=1234,
                        pad_to_multiple=32):
    """batch_size is the GLOBAL batch; each process loads its
    1/process_count slice (DistributedSampler role,
    reference:train.py:74-75)."""
    from flowtron_tpu.data.dataset import data_kwargs
    kwargs = data_kwargs(data_config)
    trainset = Data(data_config["training_files"], **kwargs)
    valset = Data(data_config["validation_files"], **kwargs,
                  speaker_ids=trainset.speaker_ids)
    collate = DataCollate(use_attn_prior=trainset.use_attn_prior,
                          pad_to_multiple=pad_to_multiple)
    nproc, pid = jax.process_count(), jax.process_index()
    local_bs = max(1, batch_size // nproc)
    if data_config.get("use_grain"):
        from flowtron_tpu.data.grain_pipeline import GrainLoader
        workers = int(data_config.get("grain_workers", 0))
        train_loader = GrainLoader(trainset, local_bs, collate,
                                   shuffle=True, seed=seed,
                                   num_shards=nproc, shard_index=pid,
                                   num_workers=workers)
        val_loader = GrainLoader(valset, local_bs, collate, shuffle=False,
                                 seed=seed, drop_last=False,
                                 num_shards=nproc, shard_index=pid,
                                 num_workers=workers)
        return train_loader, val_loader
    train_loader = PrefetchIterator(
        BatchIterator(trainset, local_bs, collate, shuffle=True,
                      seed=seed, num_shards=nproc, shard_index=pid))
    val_loader = BatchIterator(valset, local_bs, collate, shuffle=False,
                               seed=seed, drop_last=False,
                               num_shards=nproc, shard_index=pid)
    return train_loader, val_loader


def _device_batch(batch, mesh):
    """Drop None entries and place on the mesh. On multi-host runs each
    process holds only its slice of the global batch; the global array is
    assembled from the per-process data without gathering."""
    clean = {k: v for k, v in batch.items() if v is not None}
    sharding = data_sharded(mesh)
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(sharding, v)
                for k, v in clean.items()}
    return {k: jax.device_put(v, sharding) for k, v in clean.items()}


def _pad_batch_to_divisible(batch, m):
    """Tile a (possibly short) final validation batch so its leading dim is
    divisible by the data-axis size; duplicated samples slightly re-weight
    the val mean, matching the reference's batch-mean-of-means
    approximation (reference:train.py:142-202)."""
    n = len(next(iter(batch.values())))
    pad = (-n) % m
    if pad == 0:
        return batch
    idx = np.arange(n + pad) % n
    return {k: v[idx] for k, v in batch.items()}


def compute_validation_loss(eval_step, params, val_loader, mesh,
                            ctc_weight, on_batch=None):
    """on_batch(out, host_batch): optional per-batch hook — evaluate()
    uses it to accumulate quality metrics over the whole val set."""
    data_axis = batch_shard_size(mesh)
    totals = {"nll": 0.0, "gate": 0.0, "ctc": 0.0}
    n = 0
    last = None
    for batch in val_loader:
        batch = {k: v for k, v in batch.items() if v is not None}
        batch = _pad_batch_to_divisible(batch, data_axis)
        out = eval_step(params, _device_batch(batch, mesh))
        for k in totals:
            totals[k] += float(out[k])
        n += 1
        last = {**out, "batch": batch}
        if on_batch is not None:
            on_batch(out, batch)
    if n == 0:
        return {"loss": 0.0, **totals}, None
    for k in totals:
        totals[k] /= n
    loss = totals["nll"] + totals["gate"] + totals["ctc"] * ctc_weight
    return {"loss": loss, **totals}, last


def train(config):
    """Main entry: config dict with train/data/dist/model sections."""
    train_config = config["train_config"]
    data_config = dict(config["data_config"])
    dist_config = config.get("dist_config", {})
    model_config = dict(config["model_config"])

    seed = int(train_config.get("seed", 1234))
    key = jax.random.PRNGKey(seed)
    init_key, dropout_key = jax.random.split(key)

    maybe_initialize_distributed(dist_config)
    mesh = make_mesh(tuple(dist_config.get("mesh_shape", (-1,))),
                     tuple(dist_config.get("mesh_axis_names", ("data",))),
                     dcn_mesh_shape=dist_config.get("dcn_mesh_shape"))
    n_dev = int(np.prod(mesh.devices.shape))
    batch_size = int(train_config["batch_size"]) * n_dev
    print(f"mesh: {mesh.devices.shape} {mesh.axis_names}; "
          f"global batch {batch_size}")

    params, static_cfg = flowtron_init(init_key, **model_config)
    # tensor-parallel weight layout when the mesh has a 'model' axis
    params = place_params(params, mesh)

    mask = trainable_mask(params, train_config.get("finetune_layers", ()))
    base_opt = build_optimizer(
        train_config.get("optim_algo", "RAdam"),
        float(train_config["learning_rate"]),
        float(train_config.get("weight_decay", 0.0)),
        float(train_config.get("grad_clip_val", 0.0)))
    optimizer = masked_optimizer(base_opt, mask)

    iteration = 0
    opt_state = jax.jit(optimizer.init)(params)  # inherits param shardings
    if train_config.get("warmstart_checkpoint_path"):
        params = warmstart(train_config["warmstart_checkpoint_path"], params,
                           train_config.get("include_layers") or None)
    if train_config.get("checkpoint_path"):
        params, opt_state_r, iteration, _ = load_checkpoint(
            train_config["checkpoint_path"], params, opt_state,
            train_config.get("ignore_layers", ()))
        if opt_state_r is not None:
            opt_state = opt_state_r
        iteration += 1

    train_step = make_train_step(static_cfg, mesh, optimizer, train_config)
    eval_step = make_eval_step(static_cfg, mesh, train_config)

    train_loader, val_loader = prepare_dataloaders(
        data_config, batch_size, seed=seed)

    output_directory = train_config.get("output_directory", "outdir")
    os.makedirs(output_directory, exist_ok=True)

    logger = None
    if train_config.get("with_tensorboard"):
        from flowtron_tpu.train.logger import FlowtronLogger
        logger = FlowtronLogger(os.path.join(output_directory, "logs"))

    use_ctc = bool(train_config.get("use_ctc_loss", False))
    ctc_start = int(train_config.get("ctc_loss_start_iter", 0))
    ctc_w = float(train_config.get("ctc_loss_weight", 0.0))
    pa_start = int(train_config.get("prior_anneal_start_iter", 0))
    pa_end = int(train_config.get("prior_anneal_end_iter", 0))
    iters_per_checkpoint = int(train_config.get("iters_per_checkpoint", 1000))
    tone_cer_texts = int(train_config.get("tone_cer_validation_texts", 0))
    epochs = int(train_config.get("epochs", 1))
    saver = AsyncSaver()

    # optional profiler trace (SURVEY §5: the reference has no tracing at
    # all; here profile_dir captures an xplane trace of steps 10..14)
    profile_dir = train_config.get("profile_dir", "")

    profile_started = False
    epoch_offset = max(0, iteration // max(1, len(train_loader)))
    t_last = time.time()
    for epoch in range(epoch_offset, epochs):
        print(f"Epoch: {epoch}")
        for batch in train_loader:
            if profile_dir and iteration == 10:
                jax.profiler.start_trace(profile_dir)
                profile_started = True
            if profile_started and iteration == 15:
                jax.profiler.stop_trace()
                profile_started = False
                print(f"profiler trace written to {profile_dir}")
            ctc_weight = jnp.asarray(
                ctc_w if (use_ctc and iteration >= ctc_start) else 0.0,
                jnp.float32)
            step_key = jax.random.fold_in(dropout_key, iteration)
            prior_strength = jnp.asarray(
                prior_strength_schedule(iteration, pa_start, pa_end),
                jnp.float32)
            params, opt_state, metrics = train_step(
                params, opt_state, _device_batch(batch, mesh), step_key,
                ctc_weight, prior_strength)

            loss = float(metrics["loss"])
            now = time.time()
            print(f"{iteration}:\t{loss:.9f}\t({now - t_last:.2f}s)",
                  flush=True)
            t_last = now
            if logger is not None:
                logger.log_training(
                    loss, float(metrics["gate"]), float(metrics["nll"]),
                    float(metrics["ctc"]),
                    float(train_config["learning_rate"]), iteration)

            if iteration % iters_per_checkpoint == 0:
                val, last = compute_validation_loss(
                    eval_step, params, val_loader, mesh, float(ctc_weight))
                print(f"Validation loss {iteration}: {val['loss']:9f}")
                if logger is not None:
                    logger.log_validation(
                        val["loss"], val["nll"], val["gate"], val["ctc"],
                        last, iteration)
                if tone_cer_texts > 0:
                    # content-level intelligibility during training: the
                    # coded-tone corpus decodes free-running synthesis
                    # back to characters (data/tone_cer.py). Mel-path
                    # decode (no vocoder) keeps the validation cheap.
                    from flowtron_tpu.data.tone_cer import tone_cer_report
                    rep = tone_cer_report(config, params, static_cfg,
                                          max_texts=tone_cer_texts,
                                          via_audio=False)
                    print(f"Validation tone-CER(mel) {iteration}: "
                          f"{rep['tone_cer_mel']:.4f}")
                    if logger is not None:
                        logger.add_scalar("validation/tone_cer_mel",
                                          rep["tone_cer_mel"], iteration)
                ckpt = os.path.join(output_directory, f"model_{iteration}")
                # checkpoint_format: pickle (default) | sharded | orbax;
                # sharded_checkpoints=true kept as the legacy spelling
                fmt = train_config.get("checkpoint_format") or (
                    "sharded" if train_config.get("sharded_checkpoints")
                    else "pickle")
                saver.save(ckpt, params, opt_state, iteration,
                           float(train_config["learning_rate"]), config,
                           fmt=fmt)
            iteration += 1

    if profile_started:  # run ended inside the trace window
        jax.profiler.stop_trace()
        print(f"profiler trace written to {profile_dir}")
    saver.wait()
    return params, opt_state, iteration
