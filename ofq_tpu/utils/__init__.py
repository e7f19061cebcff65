"""Utilities: profiling, meters."""

from .profiling import AverageMeter, StepTimer, trace

__all__ = ["AverageMeter", "StepTimer", "trace"]
