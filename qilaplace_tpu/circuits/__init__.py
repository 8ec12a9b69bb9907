from qilaplace_tpu.circuits import qft_gates, dt_gates, zt_gates

__all__ = ["qft_gates", "dt_gates", "zt_gates"]
