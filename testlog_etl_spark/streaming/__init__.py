"""Structured Streaming surface (SURVEY SS2.9).

The reference is micro-batch-by-queue (SQS at-least-once + idempotent
sinks + manual backfill), not an event-time engine; its Spark analog is
the file-source -> transform -> `foreachBatch` idempotent-write loop,
with checkpoints playing the SQS commit. Event-time windows/watermarks
are a SUPERSET we expose because the engine should also serve the
driver's `events` stream shape.
"""
