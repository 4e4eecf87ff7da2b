from ofasys_tpu.task.base import Task, TaskConfig

__all__ = ["Task", "TaskConfig"]
