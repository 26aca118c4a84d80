from xllm_tpu.scheduler.continuous import ContinuousScheduler, SchedulerOutput

__all__ = ["ContinuousScheduler", "SchedulerOutput"]
