from flowtron_tpu.vocoder.waveglow import (  # noqa: F401
    waveglow_init, waveglow_forward, waveglow_infer, waveglow_infer_z,
    waveglow_n_remaining, waveglow_loss, load_waveglow,
    import_waveglow_torch,
)

