"""Job-matching domain queries mapped onto the test lake (filled in below)."""
