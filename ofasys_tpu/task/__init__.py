from ofasys_tpu.task.base import Task, TaskConfig
from ofasys_tpu.task.traverse_task import TraverseTask
from ofasys_tpu.task import tasks  # register the task zoo

__all__ = ["Task", "TaskConfig", "TraverseTask"]
