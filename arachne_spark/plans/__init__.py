"""Job config, storage/commit, lineage — the planning layer."""
