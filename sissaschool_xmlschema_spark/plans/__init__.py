"""Plan compilation (driver-side, once) and execution (one Spark job)."""
