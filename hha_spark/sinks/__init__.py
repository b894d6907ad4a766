from hha_spark.sinks.alerts import append_alerts, recent_alerts

__all__ = ["append_alerts", "recent_alerts"]
