from fbbev_tpu.data.nuscenes import NuScenesDataset, compute_sequence_flags  # noqa: F401
from fbbev_tpu.data.sampler import (  # noqa: F401
    EvalGroupStreamSampler, InfiniteGroupStreamSampler)
from fbbev_tpu.data.synthetic import SyntheticClipDataset, collate  # noqa: F401
from fbbev_tpu.data.wrappers import CBGSDataset, RepeatDataset  # noqa: F401
