"""Structured Streaming replay: foreachBatch MERGE with epoch fencing + lineage."""
