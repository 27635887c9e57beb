from mimrl_tpu.core.config import MimrlConfig, parse_args, build_arg_parser

__all__ = ["MimrlConfig", "parse_args", "build_arg_parser"]
