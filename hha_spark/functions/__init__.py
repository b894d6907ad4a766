from hha_spark.functions.ip import ip_to_net24, net24_base

__all__ = ["ip_to_net24", "net24_base"]
