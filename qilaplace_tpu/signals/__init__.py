from qilaplace_tpu.signals import generate, encode

__all__ = ["generate", "encode"]
