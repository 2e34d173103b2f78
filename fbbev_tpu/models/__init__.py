from fbbev_tpu.models import layers  # noqa: F401
from fbbev_tpu.models.resnet import ResNet  # noqa: F401
from fbbev_tpu.models.fpn import CustomFPN  # noqa: F401
from fbbev_tpu.models.depth_net import CM_ContextNet, CM_DepthNet  # noqa: F401
from fbbev_tpu.models.lss import LSSViewTransformer3D  # noqa: F401
from fbbev_tpu.models.bevformer import BackwardProjection  # noqa: F401
from fbbev_tpu.models.resnet3d import CustomResNet3D  # noqa: F401
from fbbev_tpu.models.fpn3d import FPN3D  # noqa: F401
from fbbev_tpu.models.occ_head import OccHead  # noqa: F401
from fbbev_tpu.models.fbocc import FBOCC, TemporalState  # noqa: F401
