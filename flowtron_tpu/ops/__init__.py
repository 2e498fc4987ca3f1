from flowtron_tpu.ops.lstm import (  # noqa: F401
    lstm_params,
    lstm_forward,
    bilstm_forward,
    lstm_single_direction,
    lstm_cell,
)
