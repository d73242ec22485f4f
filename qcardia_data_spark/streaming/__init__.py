"""[ext] Structured Streaming surface over the events table (SURVEY §2.12).

The reference is batch-only; this is the engine's streaming extension:
watermarked event-time windows (tumbling/sliding/session), in-watermark
dedup, and a custom stateful operator via applyInPandasWithState.
"""
