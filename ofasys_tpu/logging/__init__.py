from ofasys_tpu.logging.meters import AverageMeter, MetersDict, StopwatchMeter, SumMeter, TimeMeter

__all__ = ["AverageMeter", "SumMeter", "TimeMeter", "StopwatchMeter", "MetersDict"]
