"""Re-export: the activation registry lives in mimrl_tpu.utils.activations
(utils has no package-level model imports, which keeps the mi <-> models
import order acyclic)."""

from mimrl_tpu.utils.activations import get_activation_fn

__all__ = ["get_activation_fn"]
