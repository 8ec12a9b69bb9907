from qilaplace_tpu.models.pipelines import QFTPipeline, DTPipeline, ZTPipeline

__all__ = ["QFTPipeline", "DTPipeline", "ZTPipeline"]
