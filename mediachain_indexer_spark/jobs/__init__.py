"""spark-submit entrypoints (north rule: `spark-submit --py-files` jobs)."""
