from sutro_spark.streaming.progress import ProgressTracker

__all__ = ["ProgressTracker"]
