from fbbev_tpu.utils.profiling import run_time, flops_estimate  # noqa: F401
from fbbev_tpu.utils.fuse_bn import fold_batch_norms  # noqa: F401
from fbbev_tpu.utils.logging_hooks import (  # noqa: F401
    CsvLogger, WebhookLogger)
