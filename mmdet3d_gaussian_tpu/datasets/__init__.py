from . import pipelines  # noqa: F401
from . import other_datasets  # noqa: F401
from . import kitti  # noqa: F401
from .dbsampler import BatchSampler, DataBaseSampler
from .mem_util import SharedDictOfList, SharedList
from .pipelines import collate_batch
