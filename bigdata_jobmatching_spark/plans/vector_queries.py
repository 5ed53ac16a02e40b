"""Vector workload over ``embeddings`` (filled in below)."""
