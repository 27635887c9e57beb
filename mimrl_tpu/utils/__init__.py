from mimrl_tpu.utils.parsers import (
    str2bool,
    str2bools,
    str2floats,
    str2listoffints,
)
from mimrl_tpu.utils.misc import topk_np

__all__ = [
    "str2bool",
    "str2bools",
    "str2floats",
    "str2listoffints",
    "topk_np",
]
