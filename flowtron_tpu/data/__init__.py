from flowtron_tpu.data.dataset import Data, load_filepaths_and_text, load_wav  # noqa: F401
from flowtron_tpu.data.collate import (  # noqa: F401
    DataCollate, BatchIterator, PrefetchIterator,
)
from flowtron_tpu.data.prior import beta_binomial_prior  # noqa: F401
