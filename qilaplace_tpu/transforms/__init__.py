from qilaplace_tpu.transforms import qft, dt, zt

__all__ = ["qft", "dt", "zt"]
