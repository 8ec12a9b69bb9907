from qilaplace_tpu.utils import bits, config

__all__ = ["bits", "config"]
