from mimrl_tpu.utils.activations import get_activation_fn
from mimrl_tpu.models.cubemlp import MLP, MLPsBlock, MLPEncoder
from mimrl_tpu.models.model import MimrlModel, get_output_dim
from mimrl_tpu.models.bert import BertConfig, BertModel

__all__ = [
    "get_activation_fn",
    "MLP",
    "MLPsBlock",
    "MLPEncoder",
    "MimrlModel",
    "get_output_dim",
    "BertConfig",
    "BertModel",
]
