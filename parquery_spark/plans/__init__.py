from parquery_spark.plans.aggregation import build_aggregation_plan, empty_result_plan

__all__ = ["build_aggregation_plan", "empty_result_plan"]
