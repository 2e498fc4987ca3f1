from flowtron_tpu.models.flowtron import (  # noqa: F401
    flowtron_init,
    flowtron_forward,
    flowtron_infer,
    flowtron_test_invertibility,
)
