from uig.metrics.writer import MetricsWriter, StepTimer

__all__ = ["MetricsWriter", "StepTimer"]
