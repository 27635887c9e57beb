from mimrl_tpu.train.solver import Solver

__all__ = ["Solver"]
