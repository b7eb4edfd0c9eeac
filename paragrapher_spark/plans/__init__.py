from paragrapher_spark.plans.checkpoint import CheckpointManager

__all__ = ["CheckpointManager"]
