from ofasys_tpu.metric.base import BaseMetric, MetricConfig
from ofasys_tpu.metric import metrics  # register metric zoo

__all__ = ["BaseMetric", "MetricConfig"]
