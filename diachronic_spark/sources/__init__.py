"""Sources: wiki XML ingestion, manifest anti-join, synthetic fixtures."""
