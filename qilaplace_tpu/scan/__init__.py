from qilaplace_tpu.scan import pole_scan

__all__ = ["pole_scan"]
