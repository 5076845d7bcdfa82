from nibbler_spark.streaming.rebatcher import FakeClock, ReBatcher

__all__ = ["ReBatcher", "FakeClock"]
