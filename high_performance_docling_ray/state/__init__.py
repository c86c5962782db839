"""State: shard manifests / resume, metrics counters."""
