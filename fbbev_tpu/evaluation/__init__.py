from fbbev_tpu.evaluation.occ_metrics import MIoUMetric  # noqa: F401
from fbbev_tpu.evaluation.format import occ_pred_to_cvpr_format  # noqa: F401
