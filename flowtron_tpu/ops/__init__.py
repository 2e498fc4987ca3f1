from flowtron_tpu.ops.lstm import (  # noqa: F401
    lstm_params,
    lstm_forward,
    bilstm_forward,
    lstm_single_direction,
    lstm_cell,
)
from flowtron_tpu.ops.attention_pallas import (  # noqa: F401
    attention_scores_pallas,
    attention_scores_xla,
)
