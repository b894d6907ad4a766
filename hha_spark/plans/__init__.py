from hha_spark.plans.sql_pipeline import detect_spikes_sql, spike_sql

__all__ = ["detect_spikes_sql", "spike_sql"]
