from grower_spark.plans.template import LogFormat
from grower_spark.plans.caster import CastPlan, build_cast
from grower_spark.plans.pipeline import LogPipeline

__all__ = ["LogFormat", "CastPlan", "build_cast", "LogPipeline"]
