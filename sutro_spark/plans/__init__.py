from sutro_spark.plans.jobs import JobRegistry, JobStatus
from sutro_spark.plans.cost import estimate_cost

__all__ = ["JobRegistry", "JobStatus", "estimate_cost"]
