"""Multi-chip scale-out: sharded vademecum sweeps and enrichment steps."""
