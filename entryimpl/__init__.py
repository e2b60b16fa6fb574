"""Registry implementation package: query functions by family
+ shared helpers. Assembled by __spark_entry__."""
